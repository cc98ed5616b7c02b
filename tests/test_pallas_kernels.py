"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hidvae_tpu.ops.pallas.rq_kernels import (
    rq_assign,
    rq_assign_auto,
    rq_assign_reference,
)

INTERPRET = jax.default_backend() != "tpu"


class TestRqAssign:
    @pytest.mark.parametrize("b,k,d,l", [(64, 32, 16, 3), (100, 64, 32, 2)])
    def test_matches_reference(self, b, k, d, l):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, d), jnp.float32)
        cbs = jnp.asarray(rng.randn(l, k, d), jnp.float32)
        ids_k, qsum_k = rq_assign(x, cbs, block_b=32, interpret=INTERPRET)
        ids_r, qsum_r = rq_assign_reference(x, cbs)
        np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_r))
        np.testing.assert_allclose(np.asarray(qsum_k), np.asarray(qsum_r),
                                   rtol=1e-4, atol=1e-4)

    def test_padding_path(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(37, 8), jnp.float32)  # not a block multiple
        cbs = jnp.asarray(rng.randn(3, 16, 8), jnp.float32)
        ids_k, qsum_k = rq_assign(x, cbs, block_b=16, interpret=INTERPRET)
        ids_r, qsum_r = rq_assign_reference(x, cbs)
        np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_r))
        assert ids_k.shape == (37, 3)

    def test_exact_codebook_points(self):
        """Inputs that ARE codebook rows must map to themselves at level 0 with
        a ~zero residual cascade."""
        rng = np.random.RandomState(2)
        cbs = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
        x = cbs[0][jnp.array([3, 7, 11])]
        ids, qsum = rq_assign(x, cbs, block_b=8, interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(ids[:, 0]), [3, 7, 11])

    def test_auto_dispatch(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(16, 8), jnp.float32)
        cbs = jnp.asarray(rng.randn(2, 8, 8), jnp.float32)
        ids, qsum = rq_assign_auto(x, cbs)
        ids_r, _ = rq_assign_reference(x, cbs)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_r))
