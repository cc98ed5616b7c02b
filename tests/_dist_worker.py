"""Worker for the two-process jax.distributed test (test_parallel.py).

Launched twice by TestMultiProcessDistributed with HIDVAE_DISTRIBUTED=1 and
the HIDVAE_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID triple set. Runs
ONE stage-1 DP train step over the global (2 procs x 2 local CPU devices)
mesh with the global batch assembled from process-local shards, then prints
the (replicated) loss. The parent asserts both ranks print the same value and
that it matches a single-process run of the identical step.
"""

import sys

import numpy as np


def main():
    from hidvae_tpu.utils.runtime import configure_runtime

    configure_runtime()  # performs jax.distributed.initialize from env

    import jax

    from tests._dist_common import run_one_step

    assert jax.process_count() == 2, jax.process_count()
    loss = run_one_step(jax.devices())
    print(f"DIST_LOSS {jax.process_index()} {loss:.8f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
