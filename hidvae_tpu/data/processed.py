"""Runtime datasets: per-item corpora and user-sequence data.

Parity: reference data/processed.py and data/tags_processed.py (ItemData,
SeqData, RecDataset). ItemData yields per-item feature batches with a
train/eval/all filter by the 95/5 item split; the tagged route adds per-item
`tags_emb` [L, tag_dim] and `tags_indices` [L]. SeqData yields user histories
with a future (target) item; training applies random-crop subsampling of
(history + target) windows (ref processed.py:193-209); eval uses the fixed
leave-one-out target.

TPU design: datasets are plain numpy-array containers (host RAM), and batches
are assembled host-side then device_put as whole pytrees; there is no
torch-geometric dependency. Data lives in a single `.npz` per (dataset, split)
produced by the builders in hidvae_tpu.data (amazon / ml / kuairand /
synthetic).
"""

import os
from dataclasses import dataclass
from enum import Enum
from typing import Iterator, Optional

import numpy as np

from hidvae_tpu.data.schemas import SeqBatch, TaggedSeqBatch

# Max raw sequence length per dataset (ref data/processed.py:36-41).
DATASET_NAME_TO_MAX_SEQ_LEN = {
    "AMAZON": 20,
    "ML_1M": 200,
    "ML_32M": 200,
    "KUAIRAND": 40,
    "SYNTHETIC": 20,
}


class RecDataset(Enum):
    AMAZON = 1
    ML_1M = 2
    ML_32M = 3
    KUAIRAND = 4
    SYNTHETIC = 5


@dataclass
class ProcessedArrays:
    """On-disk layout of a processed dataset (one .npz)."""

    item_features: np.ndarray           # [n_items, F] float32
    item_is_train: np.ndarray           # [n_items] bool (95/5 split, seed 42)
    seq_users: np.ndarray               # [n_seq] int32
    seq_items: np.ndarray               # [n_seq, max_len] int32, -1 padded
    seq_fut: np.ndarray                 # [n_seq] int32 target item (eval/test)
    seq_is_train: np.ndarray            # [n_seq] bool (kept for compat)
    tags_emb: Optional[np.ndarray] = None      # [n_items, L, tag_dim] float32
    tags_indices: Optional[np.ndarray] = None  # [n_items, L] int32 (-1 missing)
    # Three-way sequence split (ref data/amazon.py:65-91: train target
    # items[-2] over items[:-2]; eval target items[-2]; TEST target items[-1]).
    # 0=train, 1=eval, 2=test. Derived from seq_is_train when absent (old
    # files have no test rows).
    seq_split: Optional[np.ndarray] = None     # [n_seq] int8
    # Optional user-side table (ref data/ml1m.py:11 USER_HEADERS -> age /
    # gender / occupation features keyed by raw user id).
    user_features: Optional[np.ndarray] = None    # [n_users, F_u] float32
    user_feature_ids: Optional[np.ndarray] = None  # [n_users] int32 raw ids

    SPLIT_CODES = {"train": 0, "eval": 1, "test": 2}

    def __post_init__(self):
        if self.seq_split is None:
            self.seq_split = np.where(self.seq_is_train, 0, 1).astype(np.int8)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = {
            "item_features": self.item_features,
            "item_is_train": self.item_is_train,
            "seq_users": self.seq_users,
            "seq_items": self.seq_items,
            "seq_fut": self.seq_fut,
            "seq_is_train": self.seq_is_train,
            "seq_split": self.seq_split,
        }
        if self.tags_emb is not None:
            data["tags_emb"] = self.tags_emb
            data["tags_indices"] = self.tags_indices
        if self.user_features is not None:
            data["user_features"] = self.user_features
            data["user_feature_ids"] = self.user_feature_ids
        np.savez_compressed(path, **data)

    @classmethod
    def load(cls, path: str) -> "ProcessedArrays":
        z = np.load(path, allow_pickle=False)
        return cls(
            item_features=z["item_features"],
            item_is_train=z["item_is_train"],
            seq_users=z["seq_users"],
            seq_items=z["seq_items"],
            seq_fut=z["seq_fut"],
            seq_is_train=z["seq_is_train"],
            tags_emb=z["tags_emb"] if "tags_emb" in z else None,
            tags_indices=z["tags_indices"] if "tags_indices" in z else None,
            seq_split=z["seq_split"] if "seq_split" in z else None,
            user_features=z["user_features"] if "user_features" in z else None,
            user_feature_ids=(
                z["user_feature_ids"] if "user_feature_ids" in z else None
            ),
        )


def processed_path(root: str, dataset: RecDataset, split: str = "") -> str:
    name = dataset.name.lower() + (f"_{split}" if split else "")
    return os.path.join(root, "processed", f"{name}.npz")


def load_or_build(
    root: str,
    dataset: RecDataset,
    split: str = "",
    force_process: bool = False,
) -> ProcessedArrays:
    """Load the processed arrays, building them on first use (ref ItemData's
    force_process / InMemoryDataset behavior)."""
    if dataset == RecDataset.SYNTHETIC:
        split = ""  # the synthetic corpus has no named splits
    path = processed_path(root, dataset, split)
    if not force_process and os.path.exists(path):
        return ProcessedArrays.load(path)
    if dataset == RecDataset.SYNTHETIC:
        from hidvae_tpu.data.synthetic import build_synthetic

        arrays = build_synthetic()
    elif dataset == RecDataset.AMAZON:
        from hidvae_tpu.data.amazon import build_amazon

        arrays = build_amazon(root, split or "beauty")
    elif dataset in (RecDataset.ML_1M, RecDataset.ML_32M):
        from hidvae_tpu.data.movielens import build_movielens

        arrays = build_movielens(root, dataset)
    elif dataset == RecDataset.KUAIRAND:
        from hidvae_tpu.data.kuairand import build_kuairand

        arrays = build_kuairand(root)
    else:
        raise ValueError(f"Unknown dataset {dataset}")
    arrays.save(path)
    return arrays


class ItemData:
    """Per-item corpus view with train/eval/all filtering
    (ref data/processed.py:79-108, tags_processed.py:101-156)."""

    def __init__(
        self,
        root: str,
        dataset: RecDataset = RecDataset.SYNTHETIC,
        *,
        train_test_split: str = "all",
        split: str = "",
        force_process: bool = False,
        arrays: Optional[ProcessedArrays] = None,
    ):
        self.dataset = dataset
        arr = arrays if arrays is not None else load_or_build(
            root, dataset, split, force_process
        )
        self._arrays = arr
        if train_test_split == "train":
            sel = arr.item_is_train
        elif train_test_split == "eval":
            sel = ~arr.item_is_train
        else:
            sel = np.ones(len(arr.item_features), bool)
        self.indices = np.nonzero(sel)[0].astype(np.int32)
        self.item_features = arr.item_features[self.indices]
        self.has_tags = arr.tags_emb is not None
        if self.has_tags:
            self.tags_emb = arr.tags_emb[self.indices]
            self.tags_indices = arr.tags_indices[self.indices].astype(np.int32)
        else:
            self.tags_emb = None
            self.tags_indices = None

    def __len__(self):
        return len(self.item_features)

    @property
    def feature_dim(self):
        return self.item_features.shape[1]

    def batch(self, idx: np.ndarray):
        """Assemble a (Tagged)SeqBatch of single items (ref ItemData.__getitem__)."""
        x = self.item_features[idx]
        ids = idx.astype(np.int32)[:, None]
        common = dict(
            user_ids=np.zeros(len(idx), np.int32),
            ids=ids,
            ids_fut=ids,
            x=x,
            x_fut=x,
            seq_mask=np.ones((len(idx), 1), bool),
        )
        if self.has_tags:
            return TaggedSeqBatch(
                **common,
                tags_emb=self.tags_emb[idx],
                tags_indices=self.tags_indices[idx],
            )
        return SeqBatch(**common)

    def iter_batches(self, batch_size: int, rng: np.random.RandomState):
        """Infinite shuffled batch stream (ref cycled RandomSampler)."""
        n = len(self)
        while True:
            order = rng.permutation(n)
            for start in range(0, n - batch_size + 1, batch_size):
                yield self.batch(order[start : start + batch_size])

    def iter_eval_batches(self, batch_size: int):
        n = len(self)
        for start in range(0, n, batch_size):
            yield self.batch(np.arange(start, min(start + batch_size, n)))


class SeqData:
    """User-sequence view (ref data/processed.py:160-256)."""

    def __init__(
        self,
        root: str,
        dataset: RecDataset = RecDataset.SYNTHETIC,
        *,
        is_train: bool = True,
        subsample: bool = False,
        split: str = "",
        force_process: bool = False,
        arrays: Optional[ProcessedArrays] = None,
        seq_split: Optional[str] = None,
    ):
        """`seq_split` in {"train","eval","test"} selects the three-way
        sequence split (ref data/amazon.py:65-91); when None, falls back to
        the legacy is_train flag (train vs eval)."""
        self.dataset = dataset
        self.subsample = subsample
        arr = arrays if arrays is not None else load_or_build(
            root, dataset, split, force_process
        )
        self._arrays = arr
        if seq_split is not None:
            sel = arr.seq_split == ProcessedArrays.SPLIT_CODES[seq_split]
        else:
            sel = (arr.seq_split == 0) if is_train else (arr.seq_split == 1)
        idx = np.nonzero(sel)[0]
        self.users = arr.seq_users[idx]
        self.items = arr.seq_items[idx]
        self.fut = arr.seq_fut[idx]
        self.item_features = arr.item_features
        self.max_seq_len = self.items.shape[1]

    def __len__(self):
        return len(self.users)

    @property
    def feature_dim(self):
        return self.item_features.shape[1]

    def _gather_features(self, ids):
        """Feature gather with zero rows for -1 padding (ref processed.py:229-241)."""
        safe = np.where(ids >= 0, ids, 0)
        feats = self.item_features[safe]
        feats[ids < 0] = -1.0
        return feats

    def batch(self, idx: np.ndarray, rng: Optional[np.random.RandomState] = None) -> SeqBatch:
        items = self.items[idx].copy()
        fut = self.fut[idx].copy()

        if self.subsample and rng is not None:
            # Random-crop subsampling of (history + target) windows
            # (ref processed.py:193-209): pick a random window of the full
            # (history + future) sequence; the element after the window's end
            # becomes the new target.
            for r in range(len(idx)):
                seq = items[r]
                length = int((seq >= 0).sum())
                full = np.concatenate([seq[:length], [fut[r]]])
                if length + 1 > 3:
                    win_len = rng.randint(3, length + 2)  # in [3, length+1]
                    start = rng.randint(0, length + 2 - win_len)
                    window = full[start : start + win_len]
                    items[r] = -1
                    items[r, : win_len - 1] = window[:-1]
                    fut[r] = window[-1]

        mask = items >= 0
        return SeqBatch(
            user_ids=self.users[idx].astype(np.int32),
            ids=items.astype(np.int32),
            ids_fut=fut.astype(np.int32)[:, None],
            x=self._gather_features(items),
            x_fut=self._gather_features(fut[:, None]),
            seq_mask=mask,
        )

    def iter_batches(self, batch_size: int, rng: np.random.RandomState) -> Iterator[SeqBatch]:
        n = len(self)
        while True:
            order = rng.permutation(n)
            for start in range(0, n - batch_size + 1, batch_size):
                yield self.batch(order[start : start + batch_size], rng)

    def iter_eval_batches(self, batch_size: int) -> Iterator[SeqBatch]:
        n = len(self)
        for start in range(0, n, batch_size):
            yield self.batch(np.arange(start, min(start + batch_size, n)))
