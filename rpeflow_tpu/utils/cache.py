"""Host-keyed persistent XLA compilation cache.

XLA:CPU cache entries embed AOT machine code: loading a cache written on a
different machine produced SIGILL warnings and silently-garbage numerics
(all-NaN eval flow) in round 1. Keying the cache directory by a host
fingerprint makes reuse safe — a foreign machine simply starts a fresh dir —
while repeat runs on the same host (the driver's dryrun, repeated test-suite
runs) skip the multi-minute XLA:CPU compile entirely.

The round-1 segfault in ``put_executable_and_time`` while serializing the
8-device GSPMD train-step executable no longer reproduces under the current
compile-budget flags (verified by populating and re-loading the dryrun's
train step from cache); ``RPEFLOW_NO_XLA_CACHE=1`` opts out if it ever
resurfaces.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """A stable fingerprint of this machine's CPU (node + ISA + model)."""
    parts = [platform.node(), platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


def enable_host_keyed_cache(
    base_dir: str,
    min_compile_secs: float = 5.0,
    skip_write_modules: tuple[str, ...] = (),
) -> str | None:
    """Point jax's persistent compilation cache at ``base_dir/<host-key>``.

    Must be called before the first compilation. Returns the cache dir, or
    None when disabled via RPEFLOW_NO_XLA_CACHE.

    ``skip_write_modules``: module-name substrings whose executables are
    never WRITTEN to the cache. XLA:CPU's ``executable.serialize()``
    segfaults the whole process for the suite's largest GSPMD executable
    (the 8-device full-model train step in test_train_step.py — reproduced
    3x at the same point, stack ends in ``put_executable_and_time``), while
    the dryrun's smaller 2-level train step serializes fine. Reads are
    unaffected. Used by tests/conftest.py.
    """
    if os.environ.get("RPEFLOW_NO_XLA_CACHE"):
        return None
    import jax

    cache_dir = os.path.join(base_dir, host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    if skip_write_modules:
        from jax._src import compilation_cache as _cc

        _orig = _cc.put_executable_and_time

        def _filtered_put(cache_key, module_name, executable, backend,
                          compile_time):
            if any(s in module_name for s in skip_write_modules):
                return  # skip serializing the segfault-prone giants
            return _orig(cache_key, module_name, executable, backend,
                         compile_time)

        # jax._src.compiler calls through the module attribute, so patching
        # it is sufficient.
        _cc.put_executable_and_time = _filtered_put
    return cache_dir
