"""Generate an ML-32M-flavored synthetic corpus for the *_synthetic_ml32m
configs: 20k items / 5k users, 200-item histories (the MovieLens max window,
ref /root/reference/data/processed.py:36-41 DATASET_NAME_TO_MAX_SEQ_LEN), and
18 trailing categorical genre-style features (ref /root/reference/data/ml32m.py:80-87
appends genre one-hots to the title embedding — the origin of the trainers'
n_cat_feats=18 defaults).

This drives the plain-RQ-VAE + dedup-tokenizer route (the reference's
configs/rqvae_ml32m.gin + decoder_ml32m.gin recipe) end-to-end offline,
exercising the categorical reconstruction loss and 801-token decoder contexts
that the Beauty-scale corpus (scripts/make_synthetic_large.py) does not.
Personal revisit pools of 64 items keep the exact-item eval ceiling
meaningfully below 1 at 200-length histories. Seed-42 reproducible;
generated on demand rather than checked in.

Usage: python scripts/make_synthetic_ml32m.py [out_root]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hidvae_tpu.data.synthetic import build_synthetic  # noqa: E402


def main(root: str = "dataset/synthetic_ml32m") -> str:
    path = os.path.join(root, "processed", "synthetic.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = build_synthetic(
        n_items=20_000,
        n_users=5_000,
        level_branching=(16, 8, 4),
        max_seq_len=200,
        min_seq_len=20,
        n_cat_feats=18,
        pool_size=64,
        seed=42,
    )
    arrays.save(path)
    print(f"wrote {path}: {arrays.item_features.shape[0]} items x "
          f"{arrays.item_features.shape[1]} feats, "
          f"{arrays.seq_items.shape[0]} sequences of len {arrays.seq_items.shape[1]}")
    return path


if __name__ == "__main__":
    main(*sys.argv[1:])
