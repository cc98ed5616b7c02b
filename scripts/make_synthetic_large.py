"""Generate the Beauty-scale synthetic corpus used by the *_synthetic_large
configs (20k items / 5k users / 3-level tags with 16-128-512 raw classes).

The reference trains its headline runs on Amazon Beauty (~12k items after
filtering, /root/reference/data/amazon.py) which needs a network download;
this deterministic stand-in matches its scale and hierarchical-tag shape so
the quality gates (eval tag acc > 0.60, sem-ID repetition < 0.06 —
/root/reference/train_hidvae.py:1145, configs/h_rqvae_amazon.gin:49) are
exercised at full scale offline. Seed-42 reproducible; ~218 MB npz, so it is
generated on demand rather than checked in.

Usage: python scripts/make_synthetic_large.py [out_root]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hidvae_tpu.data.synthetic import build_synthetic  # noqa: E402


def main(root: str = "dataset/synthetic_large") -> str:
    path = os.path.join(root, "processed", "synthetic.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrays = build_synthetic(
        n_items=20_000,
        n_users=5_000,
        level_branching=(16, 8, 4),
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
