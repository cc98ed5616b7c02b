"""Amazon P5 dataset builder (Beauty / Sports / Toys).

Parity: reference data/amazon.py (plain) + data/tags_amazon.py (tagged).
Expected raw layout under `<root>/raw/<split>/` (the P5 data drop the
reference downloads from Google Drive, amazon.py:29-60 — this environment has
no egress, so place the files there manually):
  * sequential_data.txt   one line per user: `userId itemId itemId ...` (1-based)
  * datamaps.json         {"item2id": {asin: id}, ...}
  * meta.json.gz          gzipped python-literal lines of item metadata

Recipe (amazon.py:65-167):
  * ids remapped to 0-based
  * leave-one-out: train = items[:-2] (target items[-2]); eval = last
    max_seq_len of items[:-2] (target items[-2]); test target items[-1]
  * item sentence "Title: ...; Brand: ...; Categories: ...; Price: ...; "
    -> sentence-t5-xl embedding
  * 95/5 item train/test split with torch.Generator seed 42 (bit-exact
    membership parity with the reference)

Tagged variant (tags_amazon.py:214-308): flatten the category tree, drop the
first category, build exactly 5 tags per item from categories + title words +
brand + GenericTagN (seeded per item), per-level tag vocabularies and indices,
and per-level tag-string embeddings [n, 5, 768].
"""

import gzip
import json
import os
import random
import re
from ast import literal_eval
from collections import defaultdict
from typing import List, Optional

import numpy as np

from hidvae_tpu.data.processed import ProcessedArrays
from hidvae_tpu.data.text_embedding import encode_text_feature

MAX_SEQ_LEN = 20  # ref data/processed.py:36-41 (AMAZON)

# Minimal English stopword list (nltk's English stopwords are used by the
# reference, tags_amazon.py; nltk corpora need a download this image lacks).
STOPWORDS = frozenset(
    """a about above after again against all am an and any are as at be because
    been before being below between both but by could did do does doing down
    during each few for from further had has have having he her here hers him
    his how i if in into is it its just me more most my no nor not now of off
    on once only or other our ours out over own same she so some such than that
    the their theirs them then there these they this those through to too under
    until up very was we were what when where which while who whom why will
    with you your yours""".split()
)


def parse_meta(path: str) -> List[dict]:
    """Parse the python-literal-per-line gzipped metadata (ref amazon.py:22-25,
    using ast.literal_eval instead of eval on untrusted content)."""
    out = []
    with gzip.open(path, "rt") as f:
        for line in f:
            out.append(literal_eval(line.strip()))
    return out


def read_sequences(raw_dir: str, split: str, max_seq_len: int = MAX_SEQ_LEN):
    """Leave-one-out sequence split (ref amazon.py:65-91). Returns dict of
    lists with 0-based item ids."""
    splits = {sp: defaultdict(list) for sp in ("train", "eval", "test")}
    path = os.path.join(raw_dir, split, "sequential_data.txt")
    with open(path) as f:
        for line in f:
            parts = list(map(int, line.strip().split()))
            user = parts[0]
            items = [i - 1 for i in parts[1:]]

            train_items = items[:-2]
            splits["train"]["userId"].append(user)
            splits["train"]["itemId"].append(train_items)
            splits["train"]["itemId_fut"].append(items[-2])

            eval_items = items[-(max_seq_len + 2):-2]
            splits["eval"]["userId"].append(user)
            splits["eval"]["itemId"].append(
                eval_items + [-1] * (max_seq_len - len(eval_items))
            )
            splits["eval"]["itemId_fut"].append(items[-2])

            test_items = items[-(max_seq_len + 1):-1]
            splits["test"]["userId"].append(user)
            splits["test"]["itemId"].append(
                test_items + [-1] * (max_seq_len - len(test_items))
            )
            splits["test"]["itemId_fut"].append(items[-1])
    return splits


def item_sentences(item_data: List[dict]) -> List[str]:
    """Item text construction (ref amazon.py:136-147)."""
    out = []
    for row in item_data:
        cats = row.get("categories") or [["Unknown"]]
        out.append(
            "Title: " + str(row.get("title", "Unknown")) + "; "
            + "Brand: " + str(row.get("brand", "Unknown")) + "; "
            + "Categories: " + str(cats[0]) + "; "
            + "Price: " + str(row.get("price", "Unknown")) + "; "
        )
    return out


def item_split_95_5(n_items: int, seed: int = 42) -> np.ndarray:
    """95/5 split with torch RNG for bit-exact parity (ref amazon.py:160-162)."""
    try:
        import torch

        gen = torch.Generator()
        gen.manual_seed(seed)
        return (torch.rand(n_items, generator=gen) > 0.05).numpy()
    except ImportError:  # pragma: no cover
        rng = np.random.RandomState(seed)
        return rng.rand(n_items) > 0.05


def flatten_categories(categories) -> List[str]:
    """Flatten the nested category tree, dedup preserving order
    (ref tags_amazon.py:190-203)."""
    flat = []
    stack = list(categories or [])
    while stack:
        cat = stack.pop(0)
        if isinstance(cat, list):
            stack = list(cat) + stack
        else:
            flat.append(cat)
    return list(dict.fromkeys(flat))


def five_tags_for_item(row: dict, item_id: int, n_tags: int = 5) -> List[str]:
    """Exactly-5-tag construction (ref tags_amazon.py:214-275)."""
    cats = flatten_categories(row.get("categories"))
    if cats:
        cats = cats[1:]  # drop the top-level category

    if len(cats) < n_tags:
        title_words = re.findall(r"\b[A-Za-z]{3,}\b", str(row.get("title", "")))
        lower_cats = [c.lower() for c in cats]
        title_words = [
            w for w in title_words
            if w.lower() not in STOPWORDS and w.lower() not in lower_cats
        ]
        brand = str(row.get("brand", "Unknown"))
        if len(title_words) + len(cats) < n_tags and brand != "Unknown":
            if brand.lower() not in lower_cats:
                title_words.append(brand)

        rng = random.Random(42 + item_id)  # seeded per item (ref :241)
        needed = n_tags - len(cats)
        selected = []
        while len(selected) < needed:
            if title_words:
                word = rng.choice(title_words)
                title_words.remove(word)
                if word not in selected and word.strip():
                    selected.append(word)
            else:
                selected.append(f"GenericTag{len(selected) + 1}")
        tags = cats + selected
    elif len(cats) > n_tags:
        tags = cats[: n_tags - 1] + [" ".join(cats[n_tags - 1:])]
    else:
        tags = cats

    tags = [t if t.strip() else f"GenericTag{i + 1}" for i, t in enumerate(tags)]
    while len(tags) < n_tags:
        tags.append(f"GenericTag{len(tags) + 1}")
    return tags[:n_tags]


def build_tag_vocabs(tag_matrix: List[List[str]]):
    """Per-level tag vocabularies + index matrix. Returns
    (tags_indices [n, L] int32, vocabs: list of sorted tag lists)."""
    n_levels = len(tag_matrix[0])
    vocabs = []
    for level in range(n_levels):
        vocabs.append(sorted({tags[level] for tags in tag_matrix}))
    lookups = [{t: i for i, t in enumerate(v)} for v in vocabs]
    indices = np.array(
        [[lookups[l][tags[l]] for l in range(n_levels)] for tags in tag_matrix],
        np.int32,
    )
    return indices, vocabs


def _sequences_to_arrays(seqs, max_seq_len: int):
    """Flatten the three-way leave-one-out split into padded arrays
    (ref data/amazon.py:65-91 — incl. the TEST rows targeting items[-1])."""
    users, items, fut, split_code = [], [], [], []
    for sp, code in (("train", 0), ("eval", 1), ("test", 2)):
        for u, seq, f in zip(seqs[sp]["userId"], seqs[sp]["itemId"],
                             seqs[sp]["itemId_fut"]):
            padded = np.full(max_seq_len, -1, np.int32)
            trimmed = [i for i in seq if i >= 0][-max_seq_len:]
            padded[: len(trimmed)] = trimmed
            users.append(u)
            items.append(padded)
            fut.append(f)
            split_code.append(code)
    split_code = np.array(split_code, np.int8)
    return (
        np.array(users, np.int32),
        np.stack(items),
        np.array(fut, np.int32),
        split_code,
    )


def build_amazon(
    root: str,
    split: str = "beauty",
    *,
    with_tags: bool = True,
    n_tag_levels: int = 5,
    max_seq_len: int = MAX_SEQ_LEN,
    cache_dir: Optional[str] = None,
) -> ProcessedArrays:
    """Build the processed arrays for an Amazon split (plain or tagged)."""
    raw_dir = os.path.join(root, "raw")
    seq_path = os.path.join(raw_dir, split, "sequential_data.txt")
    if not os.path.exists(seq_path):
        raise FileNotFoundError(
            f"Amazon raw data not found at {seq_path}. This environment has no "
            "network egress; place the P5 data drop (sequential_data.txt, "
            "datamaps.json, meta.json.gz) under that directory "
            "(ref data/amazon.py:54-60 downloads it from Google Drive)."
        )

    with open(os.path.join(raw_dir, split, "datamaps.json")) as f:
        data_maps = json.load(f)
    asin2id = {k: int(v) - 1 for k, v in data_maps["item2id"].items()}

    meta = parse_meta(os.path.join(raw_dir, split, "meta.json.gz"))
    items = sorted(
        (m for m in meta if m.get("asin") in asin2id),
        key=lambda m: asin2id[m["asin"]],
    )
    for m in items:
        m.setdefault("brand", "Unknown")
        if m.get("brand") is None or (isinstance(m.get("brand"), float)):
            m["brand"] = "Unknown"

    sentences = item_sentences(items)
    cache = cache_dir or os.path.join(root, "cache")
    item_emb = encode_text_feature(sentences, cache_dir=cache)
    is_train = item_split_95_5(len(items))

    seqs = read_sequences(raw_dir, split, max_seq_len)
    users, item_mat, fut, seq_split = _sequences_to_arrays(seqs, max_seq_len)

    tags_emb = tags_indices = None
    if with_tags:
        tag_matrix = [
            five_tags_for_item(m, asin2id[m["asin"]], n_tag_levels) for m in items
        ]
        tags_indices, vocabs = build_tag_vocabs(tag_matrix)
        # Per-level tag-string embeddings (ref tags_amazon.py:363-396).
        flat = [t for tags in tag_matrix for t in tags]
        flat_emb = encode_text_feature(flat, cache_dir=cache)
        tags_emb = flat_emb.reshape(len(items), n_tag_levels, -1)
        # Persist the per-level vocab map (ref tag_index_{split}.pt, :399-408).
        vocab_path = os.path.join(root, "processed", f"tag_index_{split}.json")
        os.makedirs(os.path.dirname(vocab_path), exist_ok=True)
        with open(vocab_path, "w") as f:
            json.dump({"vocabs": vocabs}, f)

    return ProcessedArrays(
        item_features=np.asarray(item_emb, np.float32),
        item_is_train=is_train,
        seq_users=users,
        seq_items=item_mat,
        seq_fut=fut,
        seq_is_train=seq_split == 0,
        tags_emb=None if tags_emb is None else np.asarray(tags_emb, np.float32),
        tags_indices=tags_indices,
        seq_split=seq_split,
    )
