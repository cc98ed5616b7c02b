"""KuaiRand-1K "Beauty format" dataset builder.

Parity: reference data/kuairand_beauty_format.py (KuaiRandBeautyFormat) +
data/load_kuairand.py loaders. Expected raw layout under `<root>/raw/`:
  * log_standard_4_08_to_4_21_1k.csv, log_standard_4_22_to_5_08_1k.csv,
    log_random_4_22_to_5_08_1k.csv  (user_id, video_id, time_ms, is_click)
  * video_features_basic_1k.csv      (video_id, video_duration)
  * kuairand_video_captions.csv      (final_video_id, caption)
  * kuairand_video_categories.csv    (final_video_id,
        {first,second,third}_level_category_name)

Recipe (ref kuairand_beauty_format.py:398-469, 234-386):
  * keep is_click == 1; active users with >= min_user_interactions
  * keep videos with non-empty captions and >= 2 of the 3 category levels
  * optional stratified max_videos sampling by level-1 category (seeded)
  * leave-one-out user sequences (+ optional sliding windows)
  * caption embedding with BGE 'bge-base-zh-v1.5' (Chinese); 3-level
    tags_indices + tag-name embeddings; 95/5 item split
"""

import json
import os
from typing import Optional

import numpy as np
import pandas as pd

from hidvae_tpu.data.processed import ProcessedArrays
from hidvae_tpu.data.text_embedding import BGE_ZH_MODEL, encode_text_feature

KUAIRAND_MAX_SEQ_LEN = 40  # ref data/processed.py:36-41
LOG_FILES = (
    "log_standard_4_08_to_4_21_1k.csv",
    "log_standard_4_22_to_5_08_1k.csv",
    "log_random_4_22_to_5_08_1k.csv",
)
LEVEL_COLS = (
    "first_level_category_name",
    "second_level_category_name",
    "third_level_category_name",
)


def build_kuairand(
    root: str,
    *,
    min_user_interactions: int = 20,
    max_users: Optional[int] = None,
    max_videos: Optional[int] = None,
    max_seq_len: int = KUAIRAND_MAX_SEQ_LEN,
    random_seed: int = 42,
    cache_dir: Optional[str] = None,
) -> ProcessedArrays:
    raw = os.path.join(root, "raw")
    first_log = os.path.join(raw, LOG_FILES[0])
    if not os.path.exists(first_log):
        raise FileNotFoundError(
            f"KuaiRand raw data not found at {first_log}; place the KuaiRand-1K "
            "CSV drop there (no network egress in this environment)."
        )
    rng = np.random.RandomState(random_seed)
    cache = cache_dir or os.path.join(root, "cache")

    # --- step 1: click logs of active users (ref :398-425) ---
    logs = pd.concat(
        [
            pd.read_csv(
                os.path.join(raw, f),
                usecols=["user_id", "video_id", "time_ms", "is_click"],
            )
            for f in LOG_FILES
            if os.path.exists(os.path.join(raw, f))
        ],
        ignore_index=True,
    )
    logs = logs[logs["is_click"] == 1]
    user_counts = logs["user_id"].value_counts()
    active = user_counts[user_counts >= min_user_interactions].index
    if max_users and len(active) > max_users:
        active = rng.choice(active, max_users, replace=False)
    logs = logs[logs["user_id"].isin(set(active))]
    pool = set(logs["video_id"].unique())

    # --- step 2: high-quality videos (ref :429-461) ---
    captions = pd.read_csv(
        os.path.join(raw, "kuairand_video_captions.csv"),
        usecols=["final_video_id", "caption"],
    ).rename(columns={"final_video_id": "video_id"})
    categories = pd.read_csv(
        os.path.join(raw, "kuairand_video_categories.csv"),
        usecols=["final_video_id", *LEVEL_COLS],
    ).rename(columns={"final_video_id": "video_id"})
    videos = captions.merge(categories, on="video_id", how="left")
    videos = videos[videos["video_id"].isin(pool)].copy()
    videos["caption"] = videos["caption"].fillna("")
    videos = videos[videos["caption"].str.strip() != ""]
    for col in LEVEL_COLS:
        videos[col] = videos[col].fillna("").astype(str)
    n_tags = sum(
        (videos[col] != "") & (videos[col] != "UNKNOWN") for col in LEVEL_COLS
    )
    videos = videos[n_tags >= 2]

    # --- step 3: stratified max_videos sampling by level-1 tag (ref :463-469) ---
    if max_videos and len(videos) > max_videos:
        total = len(videos)
        parts = []
        for _, group in videos.groupby(LEVEL_COLS[0]):
            k = min(len(group), max(1, int(max_videos * len(group) / total)))
            parts.append(group.sample(k, random_state=random_seed))
        videos = pd.concat(parts).reset_index(drop=True)
    videos = videos.drop_duplicates("video_id").reset_index(drop=True)

    # --- remap ids, build sequences (ref :234-386) ---
    vid_map = {v: i for i, v in enumerate(videos["video_id"])}
    logs = logs[logs["video_id"].isin(vid_map)].copy()
    logs["itemId"] = logs["video_id"].map(vid_map)
    user_map = {u: i for i, u in enumerate(logs["user_id"].unique())}
    logs["uid"] = logs["user_id"].map(user_map)
    logs = logs.sort_values(["uid", "time_ms"])

    users, seqs, futs, split_rows = [], [], [], []
    for uid, group in logs.groupby("uid"):
        items = group["itemId"].tolist()
        if len(items) < 3:
            continue
        # Leave-one-out three-way split (ref data/amazon.py:65-91 semantics,
        # mirrored by kuairand_beauty_format.py:234-386): train/eval target
        # items[-2] over items[:-2]; TEST targets items[-1] over items[:-1].
        def emit(hist, fut, code):
            padded = np.full(max_seq_len, -1, np.int32)
            trimmed = hist[-max_seq_len:]
            padded[: len(trimmed)] = trimmed
            users.append(uid)
            seqs.append(padded)
            futs.append(fut)
            split_rows.append(code)

        emit(items[:-2], items[-2], 0)
        emit(items[:-2], items[-2], 1)
        emit(items[:-1], items[-1], 2)

    # --- features + 3-level tags (ref :507-542, 556-615) ---
    item_emb = encode_text_feature(
        videos["caption"].tolist(), model_name=BGE_ZH_MODEL, cache_dir=cache
    )
    tag_texts = [videos[col].tolist() for col in LEVEL_COLS]
    vocabs, indices_cols = [], []
    for level, col_texts in enumerate(tag_texts):
        vocab = sorted({t for t in col_texts if t and t != "UNKNOWN"})
        lookup = {t: i for i, t in enumerate(vocab)}
        indices_cols.append(
            np.array([lookup.get(t, -1) for t in col_texts], np.int32)
        )
        vocabs.append(vocab)
    tags_indices = np.stack(indices_cols, axis=1)

    flat_tags = [t if t else "UNKNOWN" for col in tag_texts for t in col]
    flat_emb = encode_text_feature(flat_tags, model_name=BGE_ZH_MODEL, cache_dir=cache)
    tags_emb = flat_emb.reshape(len(LEVEL_COLS), len(videos), -1).transpose(1, 0, 2)

    vocab_path = os.path.join(root, "processed", "kuairand_tag_index.json")
    os.makedirs(os.path.dirname(vocab_path), exist_ok=True)
    with open(vocab_path, "w") as f:
        json.dump({"vocabs": vocabs}, f, ensure_ascii=False)

    try:
        import torch

        gen = torch.Generator()
        gen.manual_seed(random_seed)
        item_is_train = (torch.rand(len(videos), generator=gen) > 0.05).numpy()
    except ImportError:  # pragma: no cover
        item_is_train = rng.rand(len(videos)) > 0.05

    return ProcessedArrays(
        item_features=np.asarray(item_emb, np.float32),
        item_is_train=item_is_train,
        seq_users=np.array(users, np.int32),
        seq_items=np.stack(seqs),
        seq_fut=np.array(futs, np.int32),
        seq_is_train=np.array(split_rows, np.int8) == 0,
        tags_emb=np.asarray(tags_emb, np.float32),
        tags_indices=tags_indices,
        seq_split=np.array(split_rows, np.int8),
    )
