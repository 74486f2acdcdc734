"""Pallas TPU kernels.

Kill switches (read at TRACE time — set them before the process first
traces the model; flipping them mid-process has no effect on shapes that
are already jit-cached):

  * ``RPEFLOW_NO_PALLAS=1`` — master switch: every dispatcher
    (correlation2d, furthest_point_sampling, fused GDFN, fused MDTA
    attention) falls back to its XLA formulation.
  * ``RPEFLOW_NO_PALLAS_CORR=1`` / ``_FPS=1`` / ``_MDTA=1`` / ``_GDFN=1``
    — disable one kernel class, leaving the others on. Used by
    ``scripts/bisect_pallas.py`` (and bench.py's degrade ladder) to
    localize a non-finite output to a single kernel after a server-side
    toolchain update (a new Mosaic version is the first suspect when a
    previously-validated graph goes non-finite; see PERF.md).

All Pallas kernels have numerically parity-tested XLA fallbacks, so every
combination of switches is safe. Values are parsed: ``0``, ``false``,
``no``, ``off`` and the empty string leave the kernel ENABLED; anything
else disables it.
"""

import os

_FALSEY = ("", "0", "false", "no", "off")

#: kernel-class keys accepted by :func:`pallas_enabled`.
KERNEL_CLASSES = ("corr", "fps", "mdta", "gdfn")


def _env_disabled(name: str) -> bool:
    return os.environ.get(name, "").strip().lower() not in _FALSEY


def pallas_enabled(kernel: str | None = None) -> bool:
    """True if Pallas is enabled (optionally: for one kernel class).

    ``kernel`` is one of ``KERNEL_CLASSES``; ``None`` checks only the
    master switch. Read at trace time — see module docstring.
    """
    if _env_disabled("RPEFLOW_NO_PALLAS"):
        return False
    if kernel is None:
        return True
    if kernel not in KERNEL_CLASSES:
        raise ValueError(f"unknown Pallas kernel class: {kernel!r}")
    return not _env_disabled(f"RPEFLOW_NO_PALLAS_{kernel.upper()}")
