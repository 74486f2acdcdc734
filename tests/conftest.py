"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-device sharding tests work
without TPU hardware (the reference had no distributed tests at all; see
SURVEY.md §4). Set RPEFLOW_TEST_TPU=1 to run the suite on real TPU devices.
"""

import os

if not os.environ.get("RPEFLOW_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Some environments register an external TPU plugin that ignores
    # JAX_PLATFORMS; force the cpu client via the config as well.
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: the unrolled decode graph is expensive to
    # compile; cache it across test runs. The directory is keyed by a host
    # fingerprint: serialized CPU executables are AOT machine code, and a
    # cache written on a different machine loads with mismatched CPU features
    # (observed: "could lead to execution errors such as SIGILL" + garbage
    # numerics that made the e2e eval produce all-NaN flow).
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        flags = ""
    host_key = hashlib.sha1(flags.encode()).hexdigest()[:12]
    jax.config.update("jax_compilation_cache_dir",
                      f"/root/repo/.jax_cache/{host_key}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
