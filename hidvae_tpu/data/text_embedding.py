"""Text-embedding utilities for the dataset builders.

Parity: reference data/preprocessing.py:80-84 (`_encode_text_feature`,
SentenceTransformer 'sentence-t5-xl' -> 768-d) and the KuaiRand builder's
Chinese BGE embedding (kuairand_beauty_format.py:52, 'BAAI/bge-base-zh-v1.5').

This environment has no network egress, so model downloads may fail; unless
HIDVAE_REQUIRE_TEXT_MODEL=1 the encoder falls back to a deterministic
hash-projection embedding (unit-norm, stable across runs) with a loud warning —
enough to exercise every downstream stage offline. Embeddings are cached per
(model, text-hash) batch on disk.
"""

import hashlib
import logging
import os
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger("hidvae_tpu.data.text_embedding")

T5_MODEL = "sentence-transformers/sentence-t5-xl"
BGE_ZH_MODEL = "BAAI/bge-base-zh-v1.5"


def _hash_embedding(texts: Sequence[str], dim: int) -> np.ndarray:
    """Deterministic fallback: token-hash bag projected to a unit sphere.

    Similar texts share tokens and therefore directions, so cluster structure
    in the data survives well enough for offline smoke training.
    """
    out = np.zeros((len(texts), dim), np.float32)
    for i, text in enumerate(texts):
        for tok in str(text).lower().split():
            h = int.from_bytes(
                hashlib.sha256(tok.encode("utf-8")).digest()[:8], "little"
            )
            rng = np.random.RandomState(h % (2 ** 31))
            out[i] += rng.randn(dim).astype(np.float32)
    norms = np.linalg.norm(out, axis=-1, keepdims=True)
    out /= np.maximum(norms, 1e-6)
    return out


def encode_text_feature(
    texts: Sequence[str],
    model_name: str = T5_MODEL,
    *,
    dim: int = 768,
    batch_size: int = 64,
    cache_dir: Optional[str] = None,
) -> np.ndarray:
    """Encode texts to [n, dim] float32 (ref preprocessing.py:80-84)."""
    texts = [str(t) for t in texts]
    cache_path = None
    if cache_dir:
        digest = hashlib.sha256(
            (model_name + "\x00" + "\x00".join(texts)).encode("utf-8")
        ).hexdigest()[:24]
        cache_path = os.path.join(cache_dir, f"textemb_{digest}.npy")
        if os.path.exists(cache_path):
            return np.load(cache_path)

    emb = None
    try:
        # Zero-egress environment: force offline so a missing model fails in
        # milliseconds instead of burning minutes in connection timeouts; a
        # locally-cached model still loads fine.
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer(model_name)
        emb = model.encode(
            texts, batch_size=batch_size, show_progress_bar=True,
            convert_to_numpy=True,
        ).astype(np.float32)
    except Exception as e:
        if os.environ.get("HIDVAE_REQUIRE_TEXT_MODEL") == "1":
            raise
        logger.warning(
            f"SentenceTransformer '{model_name}' unavailable ({e}); "
            "falling back to deterministic hash embeddings "
            "(set HIDVAE_REQUIRE_TEXT_MODEL=1 to fail instead)."
        )
        emb = _hash_embedding(texts, dim)

    if cache_path:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(cache_path, emb)
    return emb
