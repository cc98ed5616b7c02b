"""Device-mesh and sharding helpers.

Distributed-semantics parity (SURVEY.md §2.7): the reference's only
parallelism is single-node data parallelism via HF Accelerate (DDP gradient
all-reduce, fp16 autocast, main-process gating). The TPU-native equivalent is
a `jax.sharding.Mesh` with a `data` axis over ICI: batches are sharded over
`data`, parameters are replicated, and XLA inserts the gradient all-reduce
when the jitted train step's output shardings demand it. That covers 100% of
the reference's distributed semantics; an optional `model` axis additionally
shards the stage-2 embedding table / output projection (tensor parallelism the
reference lacks).

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and the
same code spans hosts over DCN (jax.devices() is global).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices=None,
) -> Mesh:
    """Create a ('data', 'model') mesh. Defaults to all devices on the data
    axis; HIDVAE_MESH_DEVICES=N caps the device count (used by tests to
    compare single-device vs multi-device trainer runs)."""
    import os

    if devices is None:
        devices = jax.devices()
        limit = os.environ.get("HIDVAE_MESH_DEVICES")
        if limit:
            devices = devices[: int(limit)]
    devices = list(devices)
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data >= 1, (
        f"n_model={n_model} needs at least {n_model} devices, "
        f"have {len(devices)}"
    )
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
        f"have {len(devices)}"
    )
    dev_array = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stage2_param_shardings(mesh: Mesh, params):
    """DP+TP shardings for EncoderDecoderRetrievalModel parameters: the
    semantic-ID embedding table, the vocab output projection, and the
    transformer FF kernels shard over 'model'; everything else replicates.
    Dimensions indivisible by the axis fall back to replication."""

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]

        def ok(s):
            for dim, axis in enumerate(s):
                if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                    return P()
            return s

        if "sem_id_embedder" in names and names[-1] == "embedding":
            return ok(P("model", None))   # vocab-sharded ID table
        if "out_proj" in names and names[-1] == "kernel":
            return ok(P(None, "model"))   # vocab-sharded logits projection
        if "ff" in names and names[-1] == "kernel":
            return ok(P(None, "model") if "dense_0" in names else P("model", None))
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec(path, leaf)), params
    )


def shard_batch(mesh: Mesh, batch):
    """Device-put every array in a batch pytree with its batch axis over 'data'."""
    sharding = batch_sharding(mesh)

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def pad_to_multiple(batch, multiple: int):
    """Pad the leading axis of every array to a multiple (for even sharding).

    Returns (padded_batch, original_size)."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(batch)
    if not leaves:
        return batch, 0
    n = leaves[0].shape[0]
    pad = (-n) % multiple

    def pad_leaf(x):
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    return jax.tree_util.tree_map(pad_leaf, batch), n
