"""Hierarchically-compounding Zipf category trees for the synthetic RAW data
generators (scripts/make_synthetic_{amazon,kuairand}.py).

Each L2 class has one L1 parent (``arange % n_l1``), each L3 one L2 parent.
Items draw an L1 class from a Zipf law, then an L2 child *under that parent*
from a steeper Zipf, then an L3 child from a steeper one still. The
compounding is what keeps a handful of classes above the reference's rare-tag
thresholds at EVERY level (ref configs/h_rqvae_kuairand.gin:42,
h_rqvae_amazon.gin:42): flat per-leaf skew averages out at L1/L2 and the
rare-tag remap would collapse every class into the special bucket.
"""

from typing import Sequence

import numpy as np


def zipf(n: int, a: float, s: float) -> np.ndarray:
    """Normalized Zipf-Mandelbrot weights 1/(rank+a)^s over n ranks."""
    w = 1.0 / (np.arange(n) + a) ** s
    return w / w.sum()


class ZipfTree:
    """A 3-level category tree with compounding Zipf item assignment."""

    def __init__(self, n_l1: int, n_l2: int, n_l3: int):
        self.n_l1, self.n_l2, self.n_l3 = n_l1, n_l2, n_l3
        self.l2_parent = np.arange(n_l2) % n_l1
        self.l3_parent = np.arange(n_l3) % n_l2
        self.l2_children = [np.nonzero(self.l2_parent == i)[0] for i in range(n_l1)]
        self.l3_children = [np.nonzero(self.l3_parent == j)[0] for j in range(n_l2)]

    def assign(
        self,
        rng: np.random.RandomState,
        n_items: int,
        l1_zipf=(1.2, 1.3),
        l2_zipf=(0.8, 1.6),
        l3_zipf=(0.6, 2.0),
    ):
        """Draw per-item (l1, l2, l3) class indices with compounding skew."""
        l1 = rng.choice(self.n_l1, n_items, p=zipf(self.n_l1, *l1_zipf))
        l2 = np.empty(n_items, np.int64)
        l3 = np.empty(n_items, np.int64)
        for i in range(self.n_l1):
            m = l1 == i
            if not m.any():
                continue
            kids = self.l2_children[i]
            l2[m] = kids[rng.choice(len(kids), m.sum(), p=zipf(len(kids), *l2_zipf))]
        for j in range(self.n_l2):
            m = l2 == j
            if not m.any():
                continue
            kids = self.l3_children[j]
            l3[m] = kids[rng.choice(len(kids), m.sum(), p=zipf(len(kids), *l3_zipf))]
        return l1, l2, l3


def personal_pool(
    rng: np.random.RandomState,
    items_by_class: Sequence[np.ndarray],
    n_items: int,
    min_pool: int,
    size: int,
) -> np.ndarray:
    """A user's personal item pool: items of one preferred L1 class (falling
    back to the whole catalog when the class is too small), subsampled to
    `size`. Revisit-heavy walks over these pools give next-item prediction
    real signal."""
    pool = items_by_class[int(rng.randint(len(items_by_class)))]
    if len(pool) < min_pool:
        pool = np.arange(n_items)
    return rng.choice(pool, size=min(len(pool), size), replace=False)
