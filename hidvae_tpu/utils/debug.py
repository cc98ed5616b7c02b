"""Debug metrics and profiling hooks.

Parity: reference modules/utils.py:65-78 (`compute_debug_metrics`: sequence
length quantiles + per-digit loss dict) and the missing-in-reference
profiling capability (SURVEY.md §5.1 — the reference has none; here,
`profile_trace` wraps a block with jax.profiler so traces can be inspected in
TensorBoard/XProf).
"""

import contextlib
import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger("hidvae_tpu.debug")


def compute_debug_metrics(batch, model_output=None, prefix: str = "") -> dict:
    """Sequence-length quantiles (+ per-digit losses when model_output given).

    batch: TokenizedSeqBatch; model_output: ModelOutput with loss_d.
    Mirrors ref modules/utils.py:65-78.
    """
    seq_lengths = np.asarray(batch.seq_mask).sum(axis=1).astype(np.float64)
    p = (prefix + "_") if prefix else ""
    out = {
        f"{p}seq_length_p{q}": float(np.quantile(seq_lengths, q))
        for q in [0.25, 0.5, 0.75, 0.9, 1]
    }
    if model_output is not None and getattr(model_output, "loss_d", None) is not None:
        loss_d = np.asarray(model_output.loss_d)
        out.update({f"{p}loss_{d}": float(loss_d[d]) for d in range(len(loss_d))})
    return out


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None, enabled: Optional[bool] = None):
    """Capture a jax.profiler trace around a block.

    Enabled when `enabled` is True or HIDVAE_PROFILE=1; traces land in
    `log_dir` (default ./profile_traces) for TensorBoard/XProf.
    """
    if enabled is None:
        enabled = os.environ.get("HIDVAE_PROFILE") == "1"
    if not enabled:
        yield
        return
    import jax

    log_dir = log_dir or os.path.join(os.getcwd(), "profile_traces")
    os.makedirs(log_dir, exist_ok=True)
    logger.info(f"Capturing jax.profiler trace to {log_dir}")
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Simple step-time EMA for observability (SURVEY.md §5.1)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema = None

    def update(self, seconds: float) -> float:
        self.ema = (
            seconds if self.ema is None
            else self.alpha * seconds + (1 - self.alpha) * self.ema
        )
        return self.ema
