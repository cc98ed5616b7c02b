"""Generate the 200k-item / 50k-user synthetic corpus for the *_synthetic_xl
configs — a 10x-Beauty-scale stress corpus (production-corpus sizing).

The reference's largest corpus is Amazon Beauty (~12k items after filtering,
/root/reference/data/amazon.py); its pipeline was never exercised past that.
This corpus sizes the index-build (precompute_corpus_ids over 200k rows), the
sorted-prefix-table constrained decoding, and serving at a realistic
production-catalog scale. Same generator as the Beauty-scale corpus
(hidvae_tpu/data/synthetic.py), wider tag tree (32/256/2048 raw classes).
Seed-42 reproducible; ~2.5 GB npz, generated on demand rather than checked in.

Usage: python scripts/make_synthetic_xl.py [out_root]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hidvae_tpu.data.synthetic import build_synthetic  # noqa: E402


def main(root: str = "dataset/synthetic_xl") -> str:
    path = os.path.join(root, "processed", "synthetic.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = build_synthetic(
        n_items=200_000,
        n_users=50_000,
        level_branching=(32, 8, 8),
        max_seq_len=20,
        min_seq_len=5,
        seed=42,
    )
    arrays.save(path)
    print(f"wrote {path}: {arrays.item_features.shape[0]} items, "
          f"{arrays.seq_items.shape[0]} sequences")
    return path


if __name__ == "__main__":
    main(*sys.argv[1:2])
