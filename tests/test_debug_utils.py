"""Tests for debug metrics and the profiler hook."""

import numpy as np

from __graft_entry__ import _example_batch
from hidvae_tpu.utils.debug import StepTimer, compute_debug_metrics, profile_trace


class TestDebugMetrics:
    def test_quantiles(self):
        batch = _example_batch(b=4, n=4, d=3, k=16)
        out = compute_debug_metrics(batch)
        # all rows fully valid -> every quantile == 12
        assert out["seq_length_p0.5"] == 12.0
        assert out["seq_length_p1"] == 12.0

    def test_per_digit_losses(self):
        batch = _example_batch(b=4, n=4, d=3, k=16)

        class Out:
            loss_d = np.array([0.5, 0.25, 0.125])

        out = compute_debug_metrics(batch, Out, prefix="eval")
        assert out["eval_loss_0"] == 0.5
        assert out["eval_loss_2"] == 0.125
        assert "eval_seq_length_p0.9" in out


class TestProfileTrace:
    def test_disabled_noop(self):
        with profile_trace(enabled=False):
            pass

    def test_enabled_writes_trace(self, tmp_path):
        import jax.numpy as jnp

        with profile_trace(log_dir=str(tmp_path), enabled=True):
            _ = jnp.arange(8).sum().block_until_ready()
        import glob

        assert glob.glob(str(tmp_path) + "/**/*", recursive=True)


class TestStepTimer:
    def test_ema(self):
        t = StepTimer(alpha=0.5)
        assert t.update(1.0) == 1.0
        assert t.update(3.0) == 2.0
