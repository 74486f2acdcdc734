"""Segmented training step: forward AND backward as per-level jits.

Why: the XLA:TPU toolchain miscompiles buffer assignment around
``tpu_custom_call`` at full-graph scale (PERF.md "Round-3 root-cause
chain"), which quarantines the fused Pallas kernels and the einsum-1x1
conv form in the MONOLITHIC train step. Segmenting the eval forward
already runs them healthy (model/segmented.py, 148.8 ms vs the 161.4
dw-bf16 monolith); this module extends the same idea to training by
chaining per-segment VJPs in Python — every compiled module (forward or
backward) stays a one-level graph.

Gradient math: the step is
    enc -> level 5 -> ... -> level 1 -> finalize(loss)
with parameters feeding every segment. Backward runs finalize's VJP
first, then levels fine -> coarse (each level's ``prev`` cotangent feeds
the next-coarser level's outputs), then the encoder; parameter gradients
accumulate across segments. Each backward jit RECOMPUTES its segment's
forward inside ``jax.vjp`` (rematerialization at segment granularity —
the monolith already remats the fusion blocks, so the FLOP overhead is
comparable).

Batch-norm: each segment receives (and returns) only ITS modules'
``batch_stats`` subtree — the per-segment variable trimming from
model/segmented.py — so the merged update is exactly the union of the
touched modules, asserted disjoint across segments (true for this
architecture: pyramids in the encoder, per-level fusers per level — the
shared estimator/context modules run with ``norm=None`` in every
shipped config; a config that BN-normalizes a shared module fails the
merge assert with a clear message). Running-stat updates are not
differentiated, exactly as in the monolith. Parameters are trimmed the
same way, so each segment's VJP returns gradients for its subtree,
accumulated into the full tree.

MI rngs: level L uses ``fold_in(step_rng, L)``. The draw stream differs
from the monolith's flax rng-path derivation — both are valid
reparametrization noise; training parity is judged by converged metrics
(SURVEY.md hard-part 5).

Single-device (the segments are plain jits, not GSPMD-sharded); the
multi-device trainer keeps the monolithic step.

Usage::

    step = make_segmented_train_step(model, tx)
    new_state, summary = step(state, batch, rng)   # same contract as
                                                   # state.make_train_step
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..model.segmented import _ENC_ONLY, _FIN_ONLY, _keep_for_level
from .state import TrainState

_PREV_KEYS = ("flow_2d", "flow_3d", "flow_feat_2d", "flow_feat_3d")


def _trim_core(tree, keep):
    """Per-segment subtree of a params/batch_stats collection."""
    core = tree.get("pwc_fusion_core", {})
    return {"pwc_fusion_core": {k: v for k, v in core.items() if keep(k)}}


def _add_core_grads(total, sub):
    """Accumulate a segment's (trimmed) param grads into the full tree."""
    tc = dict(total["pwc_fusion_core"])
    for k, v in sub["pwc_fusion_core"].items():
        tc[k] = jax.tree_util.tree_map(jnp.add, tc[k], v)
    return {"pwc_fusion_core": tc}


def _merge_stats(base: Dict, updates: list) -> Dict:
    """Deep-merge per-segment mutated batch_stats over the originals,
    asserting no module is updated by two segments."""
    import copy

    out = copy.deepcopy(dict(base))
    seen: set = set()

    def walk(dst, src, path):
        for k, v in src.items():
            if isinstance(v, dict):
                walk(dst.setdefault(k, {}), v, path + (k,))
            else:
                leaf = path + (k,)
                assert leaf not in seen, \
                    f"batch_stats for {leaf} updated by two segments"
                seen.add(leaf)
                dst[k] = v

    for upd in updates:
        walk(out, upd, ())
    return out


def make_segmented_train_step(model, tx: optax.GradientTransformation,
                              compute_mi: bool = True):
    """Build ``(state, batch, rng) -> (new_state, summary)`` from
    per-segment jits (same contract as ``state.make_train_step``)."""
    n_levels = len(model.n_samples_list)

    # ---------------- segment forward functions (pure) ----------------
    def enc_f(params, stats, batch):
        enc, mutated = model.apply(
            {"params": params, "batch_stats": stats}, batch,
            method="seg_encode_train", mutable=["batch_stats"])
        return enc, mutated["batch_stats"]

    def lvl_f(level, params, stats, batch, xyz1, xyz2, xyz1_up,
              f12, f22, f13, f23, ef, prev, rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": stats}, batch, level,
            xyz1, xyz2, xyz1_up, f12, f22, f13, f23, ef, prev, compute_mi,
            method="seg_decode_level_train", mutable=["batch_stats"],
            rngs={"mi": rng})
        return out, mutated["batch_stats"]

    def fin_f(params, stats, batch, flows_2d, flows_3d, fffin, cache,
              xyzs1, sample_indices, mi_levels):
        return model.apply(
            {"params": params, "batch_stats": stats}, batch,
            flows_2d, flows_3d, fffin, cache, xyzs1, sample_indices,
            mi_levels, method="seg_finalize_train")

    # ---------------- jitted forward segments ----------------
    enc_fwd = jax.jit(enc_f)
    lvl_fwd = {lv: jax.jit(functools.partial(lvl_f, lv))
               for lv in range(1, n_levels + 1)}
    fin_fwd = jax.jit(fin_f)

    # ---------------- jitted backward segments ----------------
    # each recomputes its forward inside jax.vjp (segment-granular remat)

    @jax.jit
    def enc_bwd(params, stats, batch, cot_enc):
        def f(p):
            enc, _ = enc_f(p, stats, batch)
            return {k: v for k, v in enc.items() if k != "sample_indices1"}

        _, vjp = jax.vjp(f, params)
        (gp,) = vjp(cot_enc)
        return gp

    def _lvl_bwd(level, params, stats, batch, xyz1, xyz2, xyz1_up,
                 f12, f22, f13, f23, ef, prev, rng, cot_out):
        def f(p, a1, a2, aup, b1, b2, b3, b4, e, pr):
            out, _ = lvl_f(level, p, stats, batch, a1, a2, aup,
                           b1, b2, b3, b4, e, pr, rng)
            return out

        _, vjp = jax.vjp(f, params, xyz1, xyz2, xyz1_up,
                         f12, f22, f13, f23, ef, prev)
        return vjp(cot_out)

    lvl_bwd = {lv: jax.jit(functools.partial(_lvl_bwd, lv))
               for lv in range(1, n_levels + 1)}

    @jax.jit
    def fin_bwd(params, stats, batch, flows_2d, flows_3d, fffin, cache,
                xyzs1, sample_indices, mi_levels):
        def f(p, f2, f3, ff, ca, xs, mi):
            loss, _ = fin_f(p, stats, batch, f2, f3, ff, ca, xs,
                            sample_indices, mi)
            return loss

        _, vjp = jax.vjp(f, params, flows_2d, flows_3d, fffin, cache,
                         xyzs1, mi_levels)
        return vjp(jnp.float32(1.0))

    @jax.jit
    def apply_updates(params, opt_state, grads):
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, optax.global_norm(grads)

    keep_enc = lambda n: n in _ENC_ONLY                      # noqa: E731
    keep_fin = lambda n: n in _FIN_ONLY                      # noqa: E731
    keeps_lvl = {lv: _keep_for_level(lv) for lv in range(1, n_levels + 1)}

    def train_step(state: TrainState, batch, rng):
        params, stats = state.params, state.batch_stats
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {lv: jax.random.fold_in(step_rng, lv)
                for lv in range(1, n_levels + 1)}
        # per-segment trimmed trees: each jit marshals (and mutates /
        # differentiates) only the modules its segment touches
        p_enc, s_enc = _trim_core(params, keep_enc), _trim_core(stats, keep_enc)
        p_fin, s_fin = _trim_core(params, keep_fin), _trim_core(stats, keep_fin)
        p_lvl = {lv: _trim_core(params, keeps_lvl[lv])
                 for lv in range(1, n_levels + 1)}
        s_lvl = {lv: _trim_core(stats, keeps_lvl[lv])
                 for lv in range(1, n_levels + 1)}

        # ---- forward (saving each segment's inputs for the bwd pass) ----
        enc, enc_stats = enc_fwd(p_enc, s_enc, batch)
        stats_updates = [enc_stats]

        outs: Dict[int, Any] = {}
        prev = None
        for lv in range(n_levels, 0, -1):
            xyz1_up = enc["xyzs1"][lv + 1] if prev is not None else None
            out, lv_stats = lvl_fwd[lv](
                p_lvl[lv], s_lvl[lv], batch, enc["xyzs1"][lv],
                enc["xyzs2"][lv], xyz1_up, enc["feats1_2d"][lv],
                enc["feats2_2d"][lv], enc["feats1_3d"][lv],
                enc["feats2_3d"][lv], enc["efeats_2d"][lv], prev, rngs[lv])
            stats_updates.append(lv_stats)
            outs[lv] = out
            prev = {k: out[k] for k in _PREV_KEYS}

        flows_2d = [outs[lv]["flow_2d"] for lv in range(n_levels, 0, -1)]
        flows_3d = [outs[lv]["flow_3d"] for lv in range(n_levels, 0, -1)]
        cache = {lv: outs[lv]["last_flow_3d"] for lv in range(1, n_levels)}
        mi_levels = {lv: (outs[lv]["mi2d"], outs[lv]["mi3d"])
                     for lv in range(1, n_levels + 1)}
        fin_args = (flows_2d, flows_3d, outs[1]["flow_feat_2d"], cache,
                    enc["xyzs1"], enc["sample_indices1"], mi_levels)
        loss, (outputs, summary) = fin_fwd(p_fin, s_fin, batch, *fin_args)

        # ---- backward: finalize -> levels fine->coarse -> encoder ----
        (g_fin, cot_f2, cot_f3, cot_ff, cot_cache, cot_xyzs1,
         cot_mi) = fin_bwd(p_fin, s_fin, batch, *fin_args)
        g_params = _add_core_grads(
            jax.tree_util.tree_map(jnp.zeros_like, params), g_fin)

        # cotangents on each level's output dict, accumulated from the
        # finalize VJP and (below) from the finer level's `prev` cotangent
        cots: Dict[int, Dict[str, Any]] = {
            lv: jax.tree_util.tree_map(jnp.zeros_like, outs[lv])
            for lv in range(1, n_levels + 1)}
        for j, lv in enumerate(range(n_levels, 0, -1)):
            cots[lv]["flow_2d"] = cots[lv]["flow_2d"] + cot_f2[j]
            cots[lv]["flow_3d"] = cots[lv]["flow_3d"] + cot_f3[j]
        for lv, c in cot_cache.items():
            cots[lv]["last_flow_3d"] = cots[lv]["last_flow_3d"] + c
        for lv, (c2, c3) in cot_mi.items():
            cots[lv]["mi2d"] = cots[lv]["mi2d"] + c2
            cots[lv]["mi3d"] = cots[lv]["mi3d"] + c3
        cots[1]["flow_feat_2d"] = cots[1]["flow_feat_2d"] + cot_ff

        # cotangents on the encoder outputs (float parts only)
        cot_enc = {
            "xyzs1": [jnp.zeros_like(x) for x in enc["xyzs1"]],
            "xyzs2": [jnp.zeros_like(x) for x in enc["xyzs2"]],
            "feats1_2d": [jnp.zeros_like(x) for x in enc["feats1_2d"]],
            "feats2_2d": [jnp.zeros_like(x) for x in enc["feats2_2d"]],
            "feats1_3d": [jnp.zeros_like(x) for x in enc["feats1_3d"]],
            "feats2_3d": [jnp.zeros_like(x) for x in enc["feats2_3d"]],
            "efeats_2d": [jnp.zeros_like(x) for x in enc["efeats_2d"]],
        }
        for i, c in enumerate(cot_xyzs1):
            cot_enc["xyzs1"][i] = cot_enc["xyzs1"][i] + c

        for lv in range(1, n_levels + 1):
            prev_in = (None if lv == n_levels
                       else {k: outs[lv + 1][k] for k in _PREV_KEYS})
            xyz1_up = enc["xyzs1"][lv + 1] if lv < n_levels else None
            (gp, c_xyz1, c_xyz2, c_xyz1up, c_f12, c_f22, c_f13, c_f23,
             c_ef, c_prev) = lvl_bwd[lv](
                p_lvl[lv], s_lvl[lv], batch, enc["xyzs1"][lv],
                enc["xyzs2"][lv], xyz1_up, enc["feats1_2d"][lv],
                enc["feats2_2d"][lv], enc["feats1_3d"][lv],
                enc["feats2_3d"][lv], enc["efeats_2d"][lv], prev_in,
                rngs[lv], cots[lv])
            g_params = _add_core_grads(g_params, gp)
            cot_enc["xyzs1"][lv] = cot_enc["xyzs1"][lv] + c_xyz1
            cot_enc["xyzs2"][lv] = cot_enc["xyzs2"][lv] + c_xyz2
            if c_xyz1up is not None:
                cot_enc["xyzs1"][lv + 1] = cot_enc["xyzs1"][lv + 1] + c_xyz1up
            cot_enc["feats1_2d"][lv] = cot_enc["feats1_2d"][lv] + c_f12
            cot_enc["feats2_2d"][lv] = cot_enc["feats2_2d"][lv] + c_f22
            cot_enc["feats1_3d"][lv] = cot_enc["feats1_3d"][lv] + c_f13
            cot_enc["feats2_3d"][lv] = cot_enc["feats2_3d"][lv] + c_f23
            cot_enc["efeats_2d"][lv] = cot_enc["efeats_2d"][lv] + c_ef
            if c_prev is not None and lv < n_levels:
                for k in _PREV_KEYS:
                    cots[lv + 1][k] = cots[lv + 1][k] + c_prev[k]

        g_params = _add_core_grads(
            g_params, enc_bwd(p_enc, s_enc, batch, cot_enc))

        new_params, new_opt_state, grad_norm = apply_updates(
            params, state.opt_state, g_params)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=_merge_stats(stats, stats_updates),
            opt_state=new_opt_state,
        )
        summary = dict(summary)
        summary["grad_norm"] = grad_norm
        import os as _os
        if _os.environ.get("RPEFLOW_SEG_DEBUG_GRADS"):
            # debug hook: expose the accumulated parameter gradients so
            # tests/triage can compare them against jax.grad of the
            # monolith directly (tolerances on post-Adam params are
            # sign-amplified and hard to attribute)
            summary["_debug_grads"] = g_params
        return new_state, summary

    return train_step
