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
import re
from typing import Any, Callable, Dict, List, Sequence

import jax

_LEVEL_SUFFIX = re.compile(r"_(\d+)$")

#: core modules used only by the encode segment
_ENC_ONLY = ("feature_pyramid_2d", "efeature_pyramid_2d",
             "feature_pyramid_3d")
#: core modules used only by the finalize segment
_FIN_ONLY = ("convex_upsampler",)


def _filter_core(core_tree: dict, keep) -> dict:
    return {k: v for k, v in core_tree.items() if keep(k)}


def _trim_variables(variables, keep) -> dict:
    """Per-segment variable subset: each jit call marshals only the
    parameter arrays its segment can touch (the full tree is ~700 leaves;
    a level segment needs ~1/4 of it). XLA would DCE the unused args
    anyway — this trims the HOST-side per-dispatch flatten/marshal cost,
    which is per-leaf through the tunneled runtime."""
    out = {}
    for coll, tree in variables.items():
        if not isinstance(tree, dict) or "pwc_fusion_core" not in tree:
            out[coll] = tree
            continue
        sub = dict(tree)
        sub["pwc_fusion_core"] = _filter_core(tree["pwc_fusion_core"], keep)
        out[coll] = sub
    return out


def _keep_for_level(level: int):
    def keep(name: str) -> bool:
        if name in _ENC_ONLY or name in _FIN_ONLY:
            return False
        m = _LEVEL_SUFFIX.search(name)
        return m is None or int(m.group(1)) == level

    return keep


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

    def _trims(variables):
        enc_v = _trim_variables(variables, lambda n: n in _ENC_ONLY)
        fin_v = _trim_variables(variables, lambda n: n in _FIN_ONLY)
        chunk_vs = []
        for chunk in chunks:
            keeps = [_keep_for_level(lv) for lv in chunk]
            chunk_vs.append(_trim_variables(
                variables, lambda n, ks=keeps: any(k(n) for k in ks)))
        return enc_v, fin_v, chunk_vs

    # memoize the trimmed trees on the variables object's identity — the
    # evaluator/bench call forward() with the same tree every step
    trim_cache: Dict[int, Any] = {}

    def forward(variables, batch) -> Dict[str, Any]:
        key = id(variables)
        if key not in trim_cache:
            trim_cache.clear()
            trim_cache[key] = _trims(variables)
        enc_v, fin_v, chunk_vs = trim_cache[key]

        enc = enc_fn(enc_v, batch)
        prev = None
        level_outs: Dict[int, Dict[str, Any]] = {}
        for cf, cv in zip(chunk_fns, chunk_vs):
            outs, prev = cf(cv, batch, enc, prev)
            level_outs.update(outs)
        # decode-loop append order is coarse -> fine
        flows_2d = [level_outs[lv]["flow_2d"] for lv in range(n_levels, 0, -1)]
        flows_3d = [level_outs[lv]["flow_3d"] for lv in range(n_levels, 0, -1)]
        cache = {lv: level_outs[lv]["last_flow_3d"]
                 for lv in range(1, n_levels)}
        return fin_fn(fin_v, batch, flows_2d, flows_3d,
                      level_outs[1]["flow_feat_2d"], cache, enc["xyzs1"])

    forward.n_segments = 2 + len(chunk_fns)
    return forward
