"""MovieLens 1M / 32M dataset builders.

Parity: reference data/ml1m.py + data/ml32m.py + the PreprocessingMixin
history pipeline (data/preprocessing.py:88-203). Expected raw layout under
`<root>/raw/`:
  * ML-1M:  movies.dat, users.dat, ratings.dat ('::'-separated, latin-1)
  * ML-32M: movies.csv, ratings.csv

Recipe:
  * drop users/movies with < 5 ratings (ref preprocessing.py:69-77)
  * item features = sentence-t5-xl title embedding (title text before the
    "(year)" suffix) ++ genre one-hots (explains vae_n_cat_feats=18,
    SURVEY.md §2.5)
  * user histories: per user sorted by timestamp, sliding windows of
    max_seq_len (stride 180 for 32M), timestamp-quantile 0.8 train/eval split
    (ref preprocessing.py:110-113, 134-203); the last window element is the
    future target
"""

import os
from typing import Optional

import numpy as np
import pandas as pd

from hidvae_tpu.data.processed import ProcessedArrays, RecDataset
from hidvae_tpu.data.text_embedding import encode_text_feature

ML_MAX_SEQ_LEN = 200  # ref data/processed.py:36-41


def _remove_low_occurrence(ratings: pd.DataFrame, target: pd.DataFrame, cols):
    """Keep rows whose id has >= 5 ratings (ref preprocessing.py:69-77)."""
    if isinstance(cols, str):
        cols = [cols]
    out = target
    for col in cols:
        counts = ratings.groupby(col).size()
        keep = counts[counts >= 5].index
        out = out[out[col].isin(keep)]
    return out


def _user_history_windows(
    ratings: pd.DataFrame,
    window_size: int,
    stride: int,
    train_split: float = 0.8,
):
    """Sliding-window user histories with a timestamp-quantile split
    (ref preprocessing.py:88-113, 134-203). The final window item is the
    future target; windows whose last timestamp is <= the train-quantile
    threshold are train rows."""
    threshold = ratings["timestamp"].quantile(train_split)
    users, seqs, futs, is_train = [], [], [], []
    max_len = window_size

    for user, group in ratings.sort_values("timestamp").groupby("userId"):
        items = group["itemId"].to_numpy()
        times = group["timestamp"].to_numpy()
        n = len(items)
        if n < 2:
            continue
        w = min(window_size + 1, n)  # +1: last element is the target
        step = stride if n > w else 1
        for start in range(0, n - w + 1, step):
            window = items[start : start + w]
            t_last = times[start + w - 1]
            padded = np.full(max_len, -1, np.int32)
            padded[: w - 1] = window[:-1]
            users.append(user)
            seqs.append(padded)
            futs.append(window[-1])
            is_train.append(bool(t_last <= threshold))

    return (
        np.array(users, np.int64).astype(np.int32),
        np.stack(seqs),
        np.array(futs, np.int32),
        np.array(is_train, bool),
    )


def _user_table(users: pd.DataFrame, ratings: pd.DataFrame):
    """ML-1M user features (ref data/ml1m.py:11,61-84): users with >= 5
    ratings; features = [age-bucket index, gender one-hot col 0, occupation
    index] as floats, keyed by raw userId."""
    users = _remove_low_occurrence(ratings, users, "userId")
    age = users["age"].str.get_dummies().values.argmax(axis=1)[:, None]
    gender = users["gender"].str.get_dummies().values[:, :1]
    occupation = users["occupation"].str.get_dummies().values.argmax(axis=1)[:, None]
    feats = np.concatenate([age, gender, occupation], axis=1).astype(np.float32)
    return feats, users["userId"].to_numpy().astype(np.int32)


def _build(
    movies: pd.DataFrame,
    ratings: pd.DataFrame,
    *,
    window_size: int,
    stride: int,
    cache_dir: Optional[str],
    users: Optional[pd.DataFrame] = None,
) -> ProcessedArrays:
    movies = _remove_low_occurrence(ratings, movies, "movieId")
    movie_mapping = {idx: i for i, idx in enumerate(movies["movieId"])}

    genres = movies["genres"].str.get_dummies("|").values.astype(np.float32)
    titles = movies["title"].apply(lambda s: str(s).split("(")[0].strip()).tolist()
    titles_emb = encode_text_feature(titles, cache_dir=cache_dir)
    x = np.concatenate([titles_emb, genres], axis=1).astype(np.float32)

    ratings = _remove_low_occurrence(ratings, ratings, ["userId", "movieId"])
    ratings = ratings[ratings["movieId"].isin(movie_mapping)].copy()
    ratings["itemId"] = ratings["movieId"].map(movie_mapping)

    seq_users, seqs, futs, is_train = _user_history_windows(
        ratings, window_size, stride
    )

    # Item-level 95/5 split with the project-wide seed-42 convention.
    try:
        import torch

        gen = torch.Generator()
        gen.manual_seed(42)
        item_is_train = (torch.rand(len(x), generator=gen) > 0.05).numpy()
    except ImportError:  # pragma: no cover
        item_is_train = np.random.RandomState(42).rand(len(x)) > 0.05

    user_features = user_feature_ids = None
    if users is not None:
        user_features, user_feature_ids = _user_table(users, ratings)

    return ProcessedArrays(
        item_features=x,
        item_is_train=item_is_train,
        seq_users=seq_users,
        seq_items=seqs,
        seq_fut=futs,
        seq_is_train=is_train,
        user_features=user_features,
        user_feature_ids=user_feature_ids,
    )


def build_movielens(
    root: str,
    dataset: RecDataset,
    *,
    max_seq_len: int = ML_MAX_SEQ_LEN,
    cache_dir: Optional[str] = None,
) -> ProcessedArrays:
    raw = os.path.join(root, "raw")
    cache = cache_dir or os.path.join(root, "cache")
    if dataset == RecDataset.ML_1M:
        movies_path = os.path.join(raw, "movies.dat")
        if not os.path.exists(movies_path):
            raise FileNotFoundError(
                f"ML-1M raw data not found at {movies_path}; place movies.dat/"
                "users.dat/ratings.dat there (no network egress here)."
            )
        movies = pd.read_csv(
            movies_path, sep="::", header=None,
            names=["movieId", "title", "genres"],
            encoding="ISO-8859-1", engine="python",
        )
        ratings = pd.read_csv(
            os.path.join(raw, "ratings.dat"), sep="::", header=None,
            names=["userId", "movieId", "rating", "timestamp"],
            encoding="ISO-8859-1", engine="python",
        )
        users = None
        users_path = os.path.join(raw, "users.dat")
        if os.path.exists(users_path):
            # USER_HEADERS parity (ref data/ml1m.py:11, read at :62-71).
            users = pd.read_csv(
                users_path, sep="::", header=None,
                names=["userId", "gender", "age", "occupation", "zipCode"],
                dtype=str, encoding="ISO-8859-1", engine="python",
            )
            users["userId"] = users["userId"].astype(int)
        return _build(movies, ratings, window_size=max_seq_len, stride=1,
                      cache_dir=cache, users=users)

    if dataset == RecDataset.ML_32M:
        movies_path = os.path.join(raw, "movies.csv")
        if not os.path.exists(movies_path):
            raise FileNotFoundError(
                f"ML-32M raw data not found at {movies_path}; place movies.csv/"
                "ratings.csv there (no network egress here)."
            )
        movies = pd.read_csv(movies_path)
        ratings = pd.read_csv(os.path.join(raw, "ratings.csv"))
        return _build(movies, ratings, window_size=max_seq_len, stride=180,
                      cache_dir=cache)

    raise ValueError(f"Not a MovieLens dataset: {dataset}")
