"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via XLA's
host-platform device-count override (the standard JAX pattern). The axon
sitecustomize pre-imports jax and pins the platform, so the env var alone
is not enough — we must override via jax.config before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate" not in flags:
    # the 8-virtual-device mesh makes collective progress by preemption
    # on few-core hosts; under load the default 40 s rendezvous
    # termination aborts the whole process (observed on a 1-core host)
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    )
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# warm compile-cache hits log a ~2KB cpu_aot_loader machine-feature
# ERROR line per loaded executable, drowning pytest output; python-level
# failures (the ones tests act on) are unaffected
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite's cost is dominated by
# recompiling the same tiny jit graphs every session
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
