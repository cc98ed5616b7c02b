"""Generate the 1M-item / 100k-user synthetic corpus for the *_synthetic_xxl
configs — the production-catalog-scale stress corpus (VERDICT r3 next #2:
train stage 1 at 1M items, not just index+serve).

Same generator as the XL corpus (hidvae_tpu/data/synthetic.py) with 5x the
items: tag tree stays 32x8x8 (2048 leaves -> remapped counts ~[33, 257, 2049],
the XL parity point) so the ~488 items/leaf packing makes quantizer DEPTH, not
tag supervision, the index-capacity lever — exactly the regime the xl4
ablation isolates at 200k. Seed-42 reproducible; ~12 GB of arrays
(savez_compressed on unit-norm gaussian features lands near that), generated
on demand rather than checked in.

Usage: python scripts/make_synthetic_xxl.py [out_root]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hidvae_tpu.data.synthetic import build_synthetic  # noqa: E402


def main(root: str = "dataset/synthetic_xxl") -> str:
    path = os.path.join(root, "processed", "synthetic.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = build_synthetic(
        n_items=1_000_000,
        n_users=100_000,
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
