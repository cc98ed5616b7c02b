"""Explicit k-means codebook initialization pass.

Parity: the reference initializes each Quantize level's codebook lazily on its
first forward batch (modules/quantize.py:103-104), cascading through the
residual levels, with up to 20k items (train_hidvae.py:692-694). Lazy
state mutation is incompatible with a pure jitted train step, so this is an
explicit pre-training pass (SURVEY.md §7 "hard parts"): encode the init batch,
then per level run Lloyd's k-means on the current residual, write the
centroids into that level's raw codebook, quantize with the layer's effective
codebook transform (SimVQ projection / L2 normalization), and subtract.
"""

import jax
import jax.numpy as jnp

from hidvae_tpu.ops.distances import DistanceMode, compute_distance
from hidvae_tpu.ops.kmeans import kmeans
from hidvae_tpu.ops.normalize import l2norm


def kmeans_init_codebooks(model, variables, x, rng, *, max_items: int = 20_000):
    """Return `variables` with every quantize level's codebook k-means-
    initialized from (residuals of) the encoded init batch.

    model: RqVae or HRqVae module definition; x: [B, input_dim] item features.
    The whole pass runs as ONE jitted program (eager per-op dispatch is
    pathological over a remote-device tunnel).
    """
    x = x[:max_items]

    @jax.jit
    def run(variables, x, rng):
        params = variables["params"]
        encoded = model.apply(
            variables, x.astype(jnp.float32), method=lambda m, x: m.encode(x)
        )
        res = encoded
        new_params = dict(params)
        for i in range(model.n_layers):
            layer_name = f"quantize_{i}"
            layer_params = dict(params[layer_name])
            rng, sub = jax.random.split(rng)
            out = kmeans(sub, res, k=model.codebook_size, max_iters=100)
            layer_params["embedding"] = out.centroids
            new_params[layer_name] = layer_params

            # Effective codebook after this level's transform (mirror
            # Quantize.codebook(): SimVQ projection then normalization).
            cb = out.centroids
            if model.codebook_sim_vq:
                kernel = layer_params["out_proj"]["kernel"]
                cb = cb @ kernel
            if i == 0 and model.codebook_normalize:
                cb = l2norm(cb, axis=-1)
            dist = compute_distance(res, cb, DistanceMode.L2)
            ids = jnp.argmin(dist, axis=-1)
            res = res - jnp.take(cb, ids, axis=0)
        return new_params

    out_vars = dict(variables)
    out_vars["params"] = run(variables, x, rng)
    return out_vars
