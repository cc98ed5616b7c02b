"""Double-buffered corpus sweep: overlap host->device feature upload with
on-device encoding.

The reference's corpus sweep is a single-device Python DataLoader loop
(ref modules/tokenizer/h_semids.py:109-133) — host batch prep and device
compute strictly alternate. Here the sweep is chunked, and while chunk k is
being encoded on the TPU, chunk k+1's feature rows are already being uploaded
(`jax.device_put` enqueues the transfer asynchronously). At 1M items the
3 GB fp32 feature matrix dominates the index-build wall time over this
environment's remote-TPU link (BASELINE.md XL table: 187 s with the upfront
monolithic transfer), so hiding compute under transfer — and never holding
more than two chunks of features in HBM — is the difference between
transfer-bound and bandwidth-bound.

Features already resident on device (jax.Array, e.g. the training-loop audit
path whose corpus lives in HBM) skip the staging entirely and are sliced
in place.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def features_fingerprint(item_features) -> str:
    """Cheap content fingerprint of a feature matrix: shape + up to 64 evenly
    spaced rows, SHA-1 hashed. Used to tie a precomputed corpus-ID table to
    the exact features it was swept from, so a same-shaped but refreshed
    catalog can never silently reuse a stale table (serve/engine.py). For
    device-resident features the readback is 64 rows — negligible."""
    import hashlib

    n = int(item_features.shape[0])
    take = min(n, 64)
    if take:
        idx = np.linspace(0, n - 1, take).astype(np.int64)
        rows = np.asarray(item_features[idx], np.float32)
    else:
        rows = np.zeros((0,), np.float32)
    h = hashlib.sha1()
    h.update(repr(tuple(int(s) for s in item_features.shape)).encode())
    h.update(np.ascontiguousarray(rows).tobytes())
    return h.hexdigest()


def sweep_corpus(
    encode_block: Callable[[jax.Array], jax.Array],
    item_features,
    chunk_size: int,
    sharding: Optional[jax.sharding.NamedSharding] = None,
) -> jax.Array:
    """Run `encode_block` over `item_features` in fixed-shape chunks.

    encode_block: jitted [chunk, F] -> [chunk, ...] (one compiled program —
        every chunk, including the padded tail, has the same static shape).
    item_features: [N, F] host numpy (staged + double-buffered) or jax.Array
        (sliced on device, no staging).
    sharding: optional NamedSharding over a 'data' mesh axis; chunks are
        placed data-parallel and the chunk size is rounded up to the axis.

    Returns the concatenated [N, ...] outputs, tail padding trimmed.
    """
    n = item_features.shape[0]
    chunk = min(chunk_size, n)
    if sharding is not None:
        chunk += (-chunk) % sharding.mesh.shape["data"]

    on_device = isinstance(item_features, jax.Array)
    feats = item_features if on_device else np.asarray(item_features)

    def stage(start):
        block = feats[start : start + chunk]
        valid = block.shape[0]
        if valid < chunk:
            pad = ((0, chunk - valid), (0, 0))
            block = jnp.pad(block, pad) if on_device else np.pad(block, pad)
        if not on_device or sharding is not None:
            # Asynchronous upload: enqueued now, consumed by the encode of a
            # LATER iteration — this is the double buffer.
            block = jax.device_put(block, sharding)
        return block, valid

    starts = list(range(0, n, chunk))
    out = []
    pending = stage(starts[0])
    for i, _ in enumerate(starts):
        block, valid = pending
        if i + 1 < len(starts):
            pending = stage(starts[i + 1])  # upload next while this encodes
        ids = encode_block(block)
        out.append(ids[:valid])
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]
