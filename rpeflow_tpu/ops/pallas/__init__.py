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

Quarantine (round 3): ``mdta`` and ``gdfn`` are DISABLED BY DEFAULT on the
current server toolchain. The leave-one-on bisect (/tmp/bisect_only.log,
PERF.md "Round-3 NaN bisect") showed each of corr/mdta/gdfn independently
poisons the flagship forward at batch >= 2; corr was cured by removing
XLA's grouped-conv lowering from the surrounding graph
(nn/mdta.py:_dw_from_params), but mdta/gdfn still produce NaN in-context
even with zero-filled output tile padding, while passing standalone runs
at the exact in-context shapes. Until they are exonerated:

  * ``RPEFLOW_PALLAS_MDTA=1`` / ``RPEFLOW_PALLAS_GDFN=1`` — force one
    quarantined kernel back on.
  * ``RPEFLOW_PALLAS_ALL=1`` — lift the quarantine for all kernels
    (explicit ``RPEFLOW_NO_PALLAS*`` switches still win). Used by
    bench.py's ladder and scripts/bisect_pallas.py so triage configs mean
    the same thing they meant in round 2.

All Pallas kernels have numerically parity-tested XLA fallbacks, so every
combination of switches is safe. Values are parsed: ``0``, ``false``,
``no``, ``off`` and the empty string leave the kernel ENABLED; anything
else disables it.
"""

import os

_FALSEY = ("", "0", "false", "no", "off")

#: kernel-class keys accepted by :func:`pallas_enabled`.
#: ``dw`` is the single-pass depthwise conv (ops/pallas/dwconv.py) that
#: replaces the flat shift-multiply form on TPU; RPEFLOW_NO_PALLAS_DW=1
#: falls back to flat (bench.py ladder rung "no-dw").
KERNEL_CLASSES = ("corr", "fps", "mdta", "gdfn", "dw")

#: kernel classes that are off-by-default on the current toolchain (see
#: module docstring); force back on with RPEFLOW_PALLAS_<K>=1 or
#: RPEFLOW_PALLAS_ALL=1.
#:
#: ``dw`` joined the quarantine in round 4: it shipped default-ON in the
#: round-3 final snapshot without a flagship-shape validation run —
#: exactly the repo's documented policy violation (new custom calls are
#: context-dependent miscompile triggers; mdta/gdfn are quarantined for
#: that reason) — and the round-3 driver bench then measured the default
#: rung non-finite (BENCH_r03.json). The round-4 A/B then INDIVIDUALLY
#: convicted it: with einsum-1x1 off (the only delta vs the validated
#: finite default), RPEFLOW_PALLAS_DW=1 measured finite=false @226.3 ms
#: (triage/validate_default.log ``probe-dw``) — a fourth independent
#: kernel showing the same context-dependent poisoning. It stays opt-in
#: until a finite flagship run with it enabled is committed under triage/.
QUARANTINED = ("mdta", "gdfn", "dw")


def _env_truthy(name: str) -> bool:
    return os.environ.get(name, "").strip().lower() not in _FALSEY


# kill-switch call sites read better with this name
_env_disabled = _env_truthy


def barrier_boundaries() -> bool:
    """True if Pallas dispatch boundaries should be optimization_barrier'd.

    OFF by default — a debug knob, not a fix. Round-3 triage history: all
    four kernels are clean standalone at their exact in-context shapes, yet
    any one of corr/mdta/gdfn enabled inside the flagship forward at batch
    >= 2 made the whole output NaN (batch 1 finite). Barriers around the
    custom calls did NOT cure it (bisect log plain_onlycorr_b4_barrier:
    still NaN); the actual trigger was XLA:TPU's grouped-conv lowering
    being perturbed by the presence of custom calls elsewhere in the graph
    (see nn/mdta.py:_dw_from_params, which removes the grouped convs and
    restores finiteness). ``RPEFLOW_PALLAS_BARRIER=1`` re-enables the
    barriers for future fusion-context triage (trace-time, like the kill
    switches).
    """
    return _env_truthy("RPEFLOW_PALLAS_BARRIER")


def maybe_barrier(tree):
    """optimization_barrier a pytree of arrays at a Pallas dispatch boundary."""
    if not barrier_boundaries():
        return tree
    import jax

    return jax.lax.optimization_barrier(tree)


def pin_hbm(*arrays):
    """Pin ``pallas_call`` operand arrays to the default (HBM) memory color.

    Round-3 root-cause defense: the post-optimization HLO of the flagship
    forward shows XLA's memory-space-assignment placing Mosaic custom-call
    OPERANDS and RESULTS in alternate memory — ``S(1)`` layout suffixes on
    the custom calls and on the ``copy-done`` buffers feeding them
    (scripts/dump_custom_call_layouts.py). The Mosaic runtime DMAs its
    HLO-level operands as HBM buffers, so an S(1)-resident operand/result
    is read/written at a wrong address — corruption that appears only in
    context (standalone graphs have no memory pressure, so MSA promotes
    nothing), varies with batch size (allocation sizes steer MSA), and is
    immune to optimization barriers (MSA runs after scheduling). The fix
    is to declare the memory color explicitly: JAX's
    ``with_memory_space_constraint`` stamps the operand aval so the
    custom call carries ``input_memory_space_colors`` and XLA must keep
    the buffer in default memory (jax._src.tpu_custom_call backend
    config). Only meaningful when lowering for real TPUs; a no-op on CPU
    (including the test suite's interpret mode).
    """
    import jax

    if jax.default_backend() != "tpu":
        return arrays if len(arrays) != 1 else arrays[0]
    from jax.experimental.pallas import tpu as pltpu

    pinned = tuple(
        pltpu.with_memory_space_constraint(a, pltpu.HBM) for a in arrays)
    return pinned if len(pinned) != 1 else pinned[0]


def hbm_out(shape, dtype):
    """An ``out_shape`` entry pinned to the HBM memory color (see pin_hbm)."""
    import jax

    if jax.default_backend() != "tpu":
        return jax.ShapeDtypeStruct(shape, dtype)
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.HBM(shape, dtype)


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
    if _env_disabled(f"RPEFLOW_NO_PALLAS_{kernel.upper()}"):
        return False
    if kernel in QUARANTINED:
        return (_env_truthy(f"RPEFLOW_PALLAS_{kernel.upper()}")
                or _env_truthy("RPEFLOW_PALLAS_ALL"))
    return True
