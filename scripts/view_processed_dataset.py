"""Inspect processed dataset artifacts.

Parity: reference scripts/view_processed_dataset.py (dataset-integrity
eyeballing: shapes, splits, tag distributions, sample rows, tag remap checks)
plus the tag analysis/plot tooling from data/load_kuairand.py:191-330
(analyze_tag_distribution / plot_tag_distribution -> tags_per_item,
tag_level_coverage, per-level top-10 charts).

Usage:
  python scripts/view_processed_dataset.py dataset/synthetic [--dataset SYNTHETIC]
      [--plots out/plots]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hidvae_tpu.data.processed import ItemData, RecDataset, SeqData  # noqa: E402

BAR = "#5B7FCE"  # one recessive hue; these are magnitude charts, not series


def plot_tag_distribution(tags_indices, out_dir: str):
    """Tag-quality charts (ref data/load_kuairand.py:262-330): tags-per-item
    histogram, per-level coverage bars, per-level top-10 class bars."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    n_items, n_levels = tags_indices.shape

    per_item = (tags_indices >= 0).sum(axis=1)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    counts = np.bincount(per_item, minlength=n_levels + 1)
    ax.bar(range(n_levels + 1), counts, color=BAR, width=0.72)
    for x, v in enumerate(counts):
        if v:
            ax.text(x, v, f"{v / n_items:.1%}", ha="center", va="bottom",
                    fontsize=9, color="#444444")
    ax.set_xlabel("non-empty tags per item")
    ax.set_ylabel("items")
    ax.set_title("Tag completeness")
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "tags_per_item.png"), dpi=100)
    plt.close(fig)

    coverage = [(tags_indices[:, l] >= 0).mean() * 100 for l in range(n_levels)]
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.bar(range(1, n_levels + 1), coverage, color=BAR, width=0.6)
    for x, v in enumerate(coverage):
        ax.text(x + 1, v + 1, f"{v:.1f}%", ha="center", fontsize=9,
                color="#444444")
    ax.set_xlabel("tag level")
    ax.set_ylabel("coverage (%)")
    ax.set_ylim(0, 105)
    ax.set_xticks(range(1, n_levels + 1))
    ax.set_title("Tag coverage per level")
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "tag_level_coverage.png"), dpi=100)
    plt.close(fig)

    fig, axes = plt.subplots(1, n_levels, figsize=(5.5 * n_levels, 4.5))
    axes = np.atleast_1d(axes)
    for l, ax in enumerate(axes):
        col = tags_indices[:, l]
        valid = col[col >= 0]
        if not len(valid):
            continue
        uniq, counts = np.unique(valid, return_counts=True)
        order = np.argsort(counts)[::-1][:10]
        ax.barh(range(len(order))[::-1], counts[order], color=BAR, height=0.72)
        ax.set_yticks(range(len(order))[::-1])
        ax.set_yticklabels([f"id {uniq[i]}" for i in order], fontsize=9)
        ax.set_title(f"level {l + 1}: top classes ({len(uniq)} total)")
        ax.set_xlabel("items")
        ax.grid(axis="x", alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "tag_top_classes.png"), dpi=100)
    plt.close(fig)
    print(f"tag distribution charts -> {out_dir}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root", help="dataset folder (containing processed/)")
    parser.add_argument("--dataset", default="SYNTHETIC",
                        choices=[d.name for d in RecDataset])
    parser.add_argument("--split", default="")
    parser.add_argument("--samples", type=int, default=3)
    parser.add_argument("--plots", default=None, metavar="DIR",
                        help="also write tag-distribution charts here")
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
        per_item = (ti >= 0).sum(axis=1)
        print(f"  avg non-empty tags per item: {per_item.mean():.2f} "
              f"(complete {np.mean(per_item == ti.shape[1]):.1%})")
        if args.plots:
            plot_tag_distribution(ti, args.plots)

    for is_train, name in [(True, "train"), (False, "eval")]:
        seq = SeqData(args.root, dataset, is_train=is_train, split=args.split)
        lengths = (seq.items >= 0).sum(axis=1)
        print(f"\n== SeqData ({name}) ==")
        print(f"sequences: {len(seq)}, max_len {seq.max_seq_len}")
        print(f"history length quantiles: "
              f"{np.percentile(lengths, [25, 50, 75, 90, 100]).astype(int).tolist()}")
        for i in range(min(args.samples, len(seq))):
            hist = [int(x) for x in seq.items[i] if x >= 0]
            print(f"  user {seq.users[i]}: {hist[:8]}{'...' if len(hist) > 8 else ''} "
                  f"-> {seq.fut[i]}")


if __name__ == "__main__":
    main()
