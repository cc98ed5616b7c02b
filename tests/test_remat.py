"""Rematerialization option: identical forward, gradients still flow."""

import jax
import numpy as np

from __graft_entry__ import _example_batch
from hidvae_tpu.models.retrieval import EncoderDecoderRetrievalModel


def test_remat_matches_plain():
    cfg = dict(embedding_dim=16, attn_dim=32, dropout=0.0, num_heads=2,
               n_layers=2, num_embeddings=32, sem_id_dim=3, max_pos=32,
               n_sem_layers=3)
    batch = _example_batch(b=4, n=4, d=3, k=32)
    plain = EncoderDecoderRetrievalModel(**cfg)
    remat = EncoderDecoderRetrievalModel(**cfg, remat=True)
    variables = plain.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, batch, False
    )
    out_p = plain.apply(variables, batch, False)
    out_r = remat.apply(variables, batch, False)
    np.testing.assert_allclose(float(out_p.loss), float(out_r.loss), rtol=1e-5)

    g = jax.grad(lambda p: remat.apply({"params": p}, batch, False).loss)(
        variables["params"]
    )
    total = sum(float(abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert total > 0
