"""Gumbel-softmax sampling with explicit PRNG threading.

Parity: reference distributions/gumbel.py:8-41. The exponential-anneal
TemperatureScheduler is provided for surface parity (the reference trainers
hard-code t=0.2; see train_hidvae.py:690).
"""

import jax
import jax.numpy as jnp


def sample_gumbel(rng, shape, dtype=jnp.float32, eps=1e-20):
    """Sample Gumbel(0, 1) via -log(-log(U + eps) + eps) (ref gumbel.py:8-11)."""
    u = jax.random.uniform(rng, shape, dtype=dtype)
    return -jnp.log(-jnp.log(u + eps) + eps)


def gumbel_softmax_sample(rng, logits, temperature):
    """softmax((logits + Gumbel noise) / T) (ref gumbel.py:14-18)."""
    y = logits + sample_gumbel(rng, logits.shape, dtype=logits.dtype)
    return jax.nn.softmax(y / temperature, axis=-1)


class TemperatureScheduler:
    """Exponential-decay Gumbel temperature schedule (ref gumbel.py:21-41)."""

    def __init__(self, t0: float, min_t: float, anneal_rate: float, step_size: int):
        self.t0 = t0
        self.min_t = min_t
        self.anneal_rate = anneal_rate
        self.step_size = step_size
        self.t = t0

    def update_t(self, it: int):
        if it % self.step_size == self.step_size - 1:
            self.t = max(self.t * float(jnp.exp(-self.anneal_rate * it)), self.min_t)

    def get_t(self, it: int) -> float:
        self.update_t(it)
        return self.t
