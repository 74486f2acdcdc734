"""Segmented eval forward: the flagship model as a chain of small jits.

Why this exists: the current XLA:TPU server toolchain miscompiles buffer
assignment/synchronization around ``tpu_custom_call`` — but ONLY at the
full flagship graph's scale (~7,900 HLO ops). Every kernel passes
standalone at its exact in-context shapes, the distilled repro sweep came
back all-finite below that scale (triage/repro_xla_custom_call.log), and
zero-store/discard experiments exonerate the kernel code itself (PERF.md
"Round-3 root-cause chain"). Running the forward as per-level jit
segments keeps every compiled module far below the trigger scale, letting
the quarantined Pallas kernels (mdta/gdfn/dw — measured 144.3 ms vs the
161.5 ms shipping default when poisoned, i.e. a ~10% prize) execute
correctly.

Cost: one extra dispatch per segment. Measured on the tunnel runtime
(2026-08-21): chained jit dispatches pipeline — 8 chained calls/iter cost
~0.7 ms more than 1 call/iter — so 7 segments add ~1 ms against a
~150 ms forward.

Eval path only (train=False, no MI, no loss): exactly the bench /
``eval_withocc.py`` configuration. Training keeps the single-jit step
(the quarantined kernels stay off there — their custom-VJP backwards are
XLA compositions anyway).

Usage::

    from rpeflow_tpu.model.segmented import make_segmented_forward
    fwd = make_segmented_forward(model)             # granularity from env
    outputs = fwd(variables, batch)                  # same as
    # model.apply(variables, batch, train=False, compute_mi=False,
    #             compute_loss=False)[0]

``RPEFLOW_SEGMENTS`` picks the granularity (trace-time, like the Pallas
kill switches): ``level`` (default; encode / one jit per decode level /
finalize), ``pairs`` (encode / coarse-3-levels / fine-2-levels /
finalize), ``decode`` (encode / whole decode / finalize — the coarsest
split, for the negative-result matrix).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Sequence

import jax


def segments_mode() -> str:
    """Granularity of the segmented forward (``RPEFLOW_SEGMENTS``)."""
    v = os.environ.get("RPEFLOW_SEGMENTS", "").strip().lower()
    return v if v in ("level", "pairs", "decode") else "level"


def segmented_enabled() -> bool:
    """True when the eval drivers should use the segmented forward
    (``RPEFLOW_SEGMENTED=1``; read at setup time like the kill switches)."""
    return os.environ.get("RPEFLOW_SEGMENTED", "").strip().lower() \
        not in ("", "0", "false", "no", "off")


def _level_chunks(n_decode_levels: int, mode: str) -> List[List[int]]:
    levels = list(range(n_decode_levels, 0, -1))  # coarse -> fine
    if mode == "decode":
        return [levels]
    if mode == "pairs":
        # coarse levels are cheap — group them; the two finest levels (the
        # hot ones) go together so the split point sits where activations
        # are still small
        return [levels[:-2] or levels, levels[-2:]] if len(levels) > 2 \
            else [levels]
    return [[lv] for lv in levels]


def make_segmented_forward(model, mode: str | None = None) -> Callable:
    """Build ``forward(variables, batch) -> outputs`` from jitted segments.

    Semantically identical to the single-jit eval forward
    (``model.apply(v, batch, train=False, compute_mi=False,
    compute_loss=False)[0]``); tests/test_segmented.py asserts equality at
    every granularity.
    """
    mode = segments_mode() if mode is None else mode
    n_levels = len(model.n_samples_list)  # decode levels (flagship: 5)
    chunks = _level_chunks(n_levels, mode)

    enc_fn = jax.jit(
        lambda v, inputs: model.apply(v, inputs, method="seg_encode"))

    def make_chunk(chunk: Sequence[int]):
        def f(v, inputs, enc, prev):
            outs = {}
            for level in chunk:
                xyz1_up = enc["xyzs1"][level + 1] if prev is not None else None
                out = model.apply(
                    v, inputs, level,
                    enc["xyzs1"][level], enc["xyzs2"][level], xyz1_up,
                    enc["feats1_2d"][level], enc["feats2_2d"][level],
                    enc["feats1_3d"][level], enc["feats2_3d"][level],
                    enc["efeats_2d"][level], prev,
                    method="seg_decode_level")
                outs[level] = out
                prev = {k: out[k] for k in
                        ("flow_2d", "flow_3d", "flow_feat_2d", "flow_feat_3d")}
            return outs, prev

        return jax.jit(f)

    chunk_fns = [make_chunk(c) for c in chunks]

    fin_fn = jax.jit(
        lambda v, inputs, flows_2d, flows_3d, fffin, cache, xyzs1:
        model.apply(v, inputs, flows_2d, flows_3d, fffin, cache, xyzs1,
                    method="seg_finalize"))

    def forward(variables, batch) -> Dict[str, Any]:
        enc = enc_fn(variables, batch)
        prev = None
        level_outs: Dict[int, Dict[str, Any]] = {}
        for cf in chunk_fns:
            outs, prev = cf(variables, batch, enc, prev)
            level_outs.update(outs)
        # decode-loop append order is coarse -> fine
        flows_2d = [level_outs[lv]["flow_2d"] for lv in range(n_levels, 0, -1)]
        flows_3d = [level_outs[lv]["flow_3d"] for lv in range(n_levels, 0, -1)]
        cache = {lv: level_outs[lv]["last_flow_3d"]
                 for lv in range(1, n_levels)}
        return fin_fn(variables, batch, flows_2d, flows_3d,
                      level_outs[1]["flow_feat_2d"], cache, enc["xyzs1"])

    forward.n_segments = 2 + len(chunk_fns)
    return forward
