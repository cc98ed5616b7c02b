"""Generate synthetic RAW KuaiRand-1K CSV files so the real builder — and the
full two-stage pipeline behind configs/{h_rqvae,decoder}_kuairand.gin — can run
end to end offline.

Unlike make_synthetic_large.py (which emits ProcessedArrays directly), this
writes the builder's expected raw layout (reference
data/kuairand_beauty_format.py:398-469: three click-log CSVs, caption and
3-level-category CSVs, video features) and lets hidvae_tpu.data.kuairand do all
filtering/splitting/embedding. The generated corpus deliberately exercises the
builder's edge paths: is_click=0 rows, users below min_user_interactions,
empty captions, videos with <2 category levels, and catalog entries never
clicked.

Learnable structure mirrors hidvae_tpu/data/synthetic.py: a 37/168/353
category tree (the reference's KuaiRand tag_class_counts,
configs/h_rqvae_kuairand.gin:35) with captions built from repeated category
tokens (L1 x3, L2 x2, L3 x1 + item-unique tokens) so the offline
hash-embedding fallback produces residual cluster structure, and user click
streams drawn from small personal pools with revisits so next-item prediction
has real signal.

Usage: python scripts/make_synthetic_kuairand.py [out_root] [n_videos] [n_users]
"""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hidvae_tpu.data.synth_tree import ZipfTree, personal_pool  # noqa: E402

N_L1, N_L2, N_L3 = 37, 168, 353  # ref configs/h_rqvae_kuairand.gin:35


def main(
    root: str = "dataset/kuairand",
    n_videos: int = 20_000,
    n_users: int = 4_000,
    seed: int = 42,
) -> str:
    n_videos, n_users = int(n_videos), int(n_users)
    rng = np.random.RandomState(seed)
    raw = os.path.join(root, "raw")
    os.makedirs(raw, exist_ok=True)

    # --- category tree: every L2 has one L1 parent, every L3 one L2 parent ---
    l1_names = [f"L1_{i:02d}" for i in range(N_L1)]
    l2_names = [f"L2_{i:03d}" for i in range(N_L2)]
    l3_names = [f"L3_{i:03d}" for i in range(N_L3)]

    # --- videos: hierarchically compounding Zipf skew
    # (hidvae_tpu/data/synth_tree.py), so that each level keeps a handful of
    # classes above the reference's rare_tag_threshold=400
    # (configs/h_rqvae_kuairand.gin:42) while the long tail exercises the
    # rare-tag remap.
    tree = ZipfTree(N_L1, N_L2, N_L3)
    l2_parent, l3_parent = tree.l2_parent, tree.l3_parent
    vid_l1, vid_l2, vid_l3 = tree.assign(rng, n_videos)

    captions, cat_rows = [], []
    for v in range(n_videos):
        l1, l2, l3 = l1_names[vid_l1[v]], l2_names[vid_l2[v]], l3_names[vid_l3[v]]
        # Repeated category tokens give the hash-embedding fallback a
        # residual scale hierarchy (L1 dominates, L3 refines).
        cap = f"{l1} {l1} {l1} {l2} {l2} {l3} vid{v} tok{v % 977}"
        r = rng.rand()
        if r < 0.02:  # empty caption -> builder must drop it
            cap = ""
        captions.append(cap)
        if 0.02 <= r < 0.04:  # <2 usable category levels -> dropped too
            cat_rows.append((v, l1, "UNKNOWN", ""))
        else:
            cat_rows.append((v, l1, l2, l3))

    # Catalog entries that are never clicked (pool filtering).
    extra = 500
    for v in range(n_videos, n_videos + extra):
        l3 = int(rng.randint(N_L3))
        cat_rows.append((v, l1_names[l2_parent[l3_parent[l3]]],
                         l2_names[l3_parent[l3]], l3_names[l3]))
        captions.append(f"unclicked vid{v}")

    pd.DataFrame({
        "final_video_id": np.arange(n_videos + extra),
        "caption": captions,
    }).to_csv(os.path.join(raw, "kuairand_video_captions.csv"), index=False)
    pd.DataFrame(
        cat_rows,
        columns=["final_video_id", "first_level_category_name",
                 "second_level_category_name", "third_level_category_name"],
    ).to_csv(os.path.join(raw, "kuairand_video_categories.csv"), index=False)
    pd.DataFrame({
        "video_id": np.arange(n_videos + extra),
        "video_duration": rng.randint(5_000, 300_000, n_videos + extra),
    }).to_csv(os.path.join(raw, "video_features_basic_1k.csv"), index=False)

    # --- click logs: personal-pool random walks with revisits ---
    vids_by_l1 = [np.nonzero(vid_l1 == c)[0] for c in range(N_L1)]
    rows = []  # (user_id, video_id, time_ms, is_click)
    base_ms = 1_649_000_000_000  # early April 2022, matching the file names
    for u in range(n_users):
        personal = personal_pool(rng, vids_by_l1, n_videos, min_pool=20, size=18)
        if rng.rand() < 0.06:  # inactive user -> filtered out by the builder
            length = rng.randint(3, 12)
        else:
            length = rng.randint(25, 61)
        t = base_ms + int(rng.randint(0, 86_400_000))
        for _ in range(length):
            t += int(rng.randint(60_000, 7_200_000))
            v = (int(rng.choice(personal)) if rng.rand() < 0.85
                 else int(rng.randint(n_videos)))
            rows.append((u, v, t, 1))
            if rng.rand() < 0.4:  # impression without a click
                t += int(rng.randint(1_000, 60_000))
                rows.append((u, int(rng.randint(n_videos)), t, 0))

    logs = pd.DataFrame(
        rows, columns=["user_id", "video_id", "time_ms", "is_click"])
    # Split rows over the three drop files by timeline position, like the
    # real drop's standard(4/08-4/21) / standard(4/22-5/08) / random files.
    frac = logs["time_ms"].rank(pct=True).to_numpy()
    names = ("log_standard_4_08_to_4_21_1k.csv",
             "log_standard_4_22_to_5_08_1k.csv",
             "log_random_4_22_to_5_08_1k.csv")
    parts = (frac < 0.45, (frac >= 0.45) & (frac < 0.85), frac >= 0.85)
    for name, mask in zip(names, parts):
        logs[mask].to_csv(os.path.join(raw, name), index=False)

    print(f"wrote {raw}: {n_videos}+{extra} videos, {n_users} users, "
          f"{len(logs)} log rows ({int(logs['is_click'].sum())} clicks)")
    return raw


if __name__ == "__main__":
    main(*sys.argv[1:4])
