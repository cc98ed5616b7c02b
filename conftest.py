"""Pytest root conftest.

Tests run on CPU with an 8-device virtual mesh emulating a multi-chip TPU
topology (SURVEY.md §4). This host's ambient environment registers a remote
single-tenant TPU plugin in *every* interpreter via sitecustomize
(PALLAS_AXON_POOL_IPS); a test process must not touch that chip — claims are
exclusive and contention deadlocks the box. sitecustomize runs before conftest,
so the only reliable way out is to re-exec pytest once with a sanitized
environment (done in pytest_configure, after restoring the captured fds so the
re-exec'd child writes to the real stdout).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: this host is single-core; recompiles dominate
# test time otherwise.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")


def pytest_configure(config):
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("AXON_LOOPBACK_RELAY", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *config.invocation_params.args],
        env,
    )
