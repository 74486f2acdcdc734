"""Pallas TPU kernels.

``RPEFLOW_NO_PALLAS=1`` is the master kill switch: every dispatcher
(correlation2d, furthest_point_sampling, fused GDFN, fused MDTA attention)
falls back to its XLA formulation. All Pallas kernels have numerically
parity-tested XLA fallbacks, so the switch is always safe — use it to
triage NaN/garbage regressions after a server-side toolchain update
(a new Mosaic version is the first suspect when a previously-validated
graph goes non-finite; see PERF.md round-2 timing-integrity incident).
"""

import os


def pallas_enabled() -> bool:
    """False when the RPEFLOW_NO_PALLAS master kill switch is set."""
    return not os.environ.get("RPEFLOW_NO_PALLAS")
