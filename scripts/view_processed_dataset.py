"""Inspect processed dataset artifacts.

Parity: reference scripts/view_processed_dataset.py (dataset-integrity
eyeballing: shapes, splits, tag distributions, sample rows, tag remap checks).

Usage:
  python scripts/view_processed_dataset.py dataset/synthetic [--dataset SYNTHETIC]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hidvae_tpu.data.processed import ItemData, RecDataset, SeqData  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", help="dataset folder (containing processed/)")
    parser.add_argument("--dataset", default="SYNTHETIC",
                        choices=[d.name for d in RecDataset])
    parser.add_argument("--split", default="")
    parser.add_argument("--samples", type=int, default=3)
    args = parser.parse_args()
    dataset = RecDataset[args.dataset]

    items = ItemData(args.root, dataset, train_test_split="all", split=args.split)
    train_items = ItemData(args.root, dataset, train_test_split="train", split=args.split)
    eval_items = ItemData(args.root, dataset, train_test_split="eval", split=args.split)
    print(f"== ItemData ({dataset.name}) ==")
    print(f"items: {len(items)} (train {len(train_items)} / eval {len(eval_items)})")
    print(f"feature dim: {items.feature_dim}")
    norms = np.linalg.norm(items.item_features, axis=-1)
    print(f"feature norms: mean={norms.mean():.4f} min={norms.min():.4f} "
          f"max={norms.max():.4f}")

    if items.has_tags:
        ti = items.tags_indices
        print(f"\n== Tags ==")
        print(f"tag levels: {ti.shape[1]}, tags_emb: {items.tags_emb.shape}")
        for level in range(ti.shape[1]):
            col = ti[:, level]
            valid = col[col >= 0]
            uniq, counts = (np.unique(valid, return_counts=True)
                            if len(valid) else (np.array([]), np.array([])))
            missing = (col < 0).mean()
            print(f"  level {level}: {len(uniq)} classes, missing {missing:.1%}, "
                  f"count range [{counts.min() if len(counts) else 0}, "
                  f"{counts.max() if len(counts) else 0}]")

    for is_train, name in [(True, "train"), (False, "eval")]:
        seq = SeqData(args.root, dataset, is_train=is_train, split=args.split)
        lengths = (seq.items >= 0).sum(axis=1)
        print(f"\n== SeqData ({name}) ==")
        print(f"sequences: {len(seq)}, max_len {seq.max_seq_len}")
        print(f"history length quantiles: "
              f"{np.percentile(lengths, [25, 50, 75, 90, 100]).astype(int).tolist()}")
        for i in range(min(args.samples, len(seq))):
            hist = [x for x in seq.items[i] if x >= 0]
            print(f"  user {seq.users[i]}: {hist[:8]}{'...' if len(hist) > 8 else ''} "
                  f"-> {seq.fut[i]}")


if __name__ == "__main__":
    main()
