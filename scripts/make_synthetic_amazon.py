"""Generate a synthetic RAW Amazon P5 data drop so the real builder — and the
full two-stage pipeline behind configs/{h_rqvae,decoder}_amazon.gin — can run
end to end offline.

Unlike make_synthetic_large.py (which emits ProcessedArrays directly), this
writes the P5 layout `hidvae_tpu.data.amazon.build_amazon` expects (reference
data/amazon.py:29-60 downloads it from Google Drive; no egress here):

  <root>/raw/<split>/sequential_data.txt   "userId itemId itemId ..." (1-based)
  <root>/raw/<split>/datamaps.json         {"item2id": {asin: id}, "user2id": ...}
  <root>/raw/<split>/meta.json.gz          python-literal metadata lines

and lets the builder do all real work: meta parsing, asin->id alignment,
leave-one-out three-way split, item-sentence embedding, the seeded 95/5 item
split, and the exactly-5-tag construction from the category tree
(ref tags_amazon.py:214-275).

The generated metadata deliberately exercises the builder's edge paths:
None/NaN brands, missing categories (-> "Unknown"), missing prices, meta rows
for asins absent from datamaps (filtered out), and category trees shallow
enough that the 5-tag construction has to fall back to title words and
GenericTagN fillers.

Learnable structure mirrors make_synthetic_kuairand.py: a 38/168/348 category
tree (the reference's raw Amazon tag_class_counts,
configs/h_rqvae_amazon.gin:35) with hierarchically compounding Zipf skew so
the rare-tag remap at the reference's threshold 30 keeps real classes per
level, item titles built from repeated category tokens so the offline
hash-embedding fallback yields residual cluster structure, and user purchase
streams drawn from small personal pools with revisits so next-item prediction
has real signal.

Usage: python scripts/make_synthetic_amazon.py [out_root] [split] [n_items] [n_users]
"""

import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hidvae_tpu.data.synth_tree import ZipfTree, personal_pool  # noqa: E402

N_L1, N_L2, N_L3 = 38, 168, 348  # ref configs/h_rqvae_amazon.gin:35


def main(
    root: str = "dataset/amazon",
    split: str = "sports",
    n_items: int = 12_000,
    n_users: int = 12_000,
    seed: int = 42,
) -> str:
    n_items, n_users = int(n_items), int(n_users)
    rng = np.random.RandomState(seed)
    raw = os.path.join(root, "raw", split)
    os.makedirs(raw, exist_ok=True)

    top = "Sports & Outdoors" if split == "sports" else split.capitalize()
    l1_names = [f"Cat{i:02d}" for i in range(N_L1)]
    l2_names = [f"Sub{i:03d}" for i in range(N_L2)]
    l3_names = [f"Leaf{i:03d}" for i in range(N_L3)]
    brands = [f"Brand{i:03d}" for i in range(400)]

    # Hierarchically compounding Zipf (hidvae_tpu/data/synth_tree.py): flat
    # per-leaf skew would average out at L1/L2 and the rare-tag remap at
    # threshold 30 (h_rqvae_amazon.gin:42) would collapse every class.
    tree = ZipfTree(N_L1, N_L2, N_L3)
    item_l1, item_l2, item_l3 = tree.assign(rng, n_items)

    # --- meta.json.gz + datamaps.json ---
    meta_rows, item2id = [], {}
    for v in range(n_items):
        asin = f"B{v:09d}"
        item2id[asin] = v + 1  # 1-based, like P5
        l1, l2, l3 = l1_names[item_l1[v]], l2_names[item_l2[v]], l3_names[item_l3[v]]
        # Repeated category tokens give the hash-embedding fallback a residual
        # scale hierarchy (L1 dominates, L3 refines); itemNNN keeps rows apart.
        title = f"{l1} {l1} {l1} {l2} {l2} {l3} item{v} model{v % 977}"
        row = {
            "asin": asin,
            "title": title,
            "brand": brands[int(rng.randint(len(brands)))],
            "categories": [[top, l1, l2, l3]],
            "price": round(float(rng.gamma(2.0, 15.0)), 2),
        }
        r = rng.rand()
        if r < 0.02:
            row["brand"] = None            # -> "Unknown" (amazon.py brand fix)
        elif r < 0.03:
            row["brand"] = 0.0             # float brand (P5 NaN) -> "Unknown"
        if 0.03 <= r < 0.05:
            row.pop("categories")          # -> [["Unknown"]] sentence path
        if 0.05 <= r < 0.07:
            row.pop("price")               # -> "Unknown" price
        if 0.07 <= r < 0.10:
            # Shallow tree: 5-tag construction must fall back to title words.
            row["categories"] = [[top, l1]]
        meta_rows.append(row)
    # Meta rows whose asin is NOT in datamaps -> build_amazon filters them.
    for v in range(300):
        meta_rows.append({
            "asin": f"X{v:09d}", "title": f"unsold item {v}",
            "brand": "NoBrand", "categories": [[top]], "price": 1.0,
        })
    rng.shuffle(meta_rows)

    with gzip.open(os.path.join(raw, "meta.json.gz"), "wt") as f:
        for row in meta_rows:
            f.write(repr(row) + "\n")

    # --- purchase sequences: personal pools with revisits ---
    items_by_l1 = [np.nonzero(item_l1 == c)[0] for c in range(N_L1)]
    user2id, lines = {}, []
    for u in range(n_users):
        personal = personal_pool(rng, items_by_l1, n_items, min_pool=12, size=14)
        length = int(rng.randint(8, 31))
        seq = [
            int(rng.choice(personal)) if rng.rand() < 0.85
            else int(rng.randint(n_items))
            for _ in range(length)
        ]
        user2id[f"A{u:08d}"] = u + 1
        lines.append(" ".join(map(str, [u + 1] + [i + 1 for i in seq])))

    with open(os.path.join(raw, "sequential_data.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(raw, "datamaps.json"), "w") as f:
        json.dump({
            "item2id": {k: str(v) for k, v in item2id.items()},
            "user2id": {k: str(v) for k, v in user2id.items()},
        }, f)

    print(f"wrote {raw}: {n_items} items (+300 unmapped meta rows), "
          f"{n_users} users")
    return raw


if __name__ == "__main__":
    main(*sys.argv[1:5])
