"""Benchmark: inference throughput of the flagship RPEFlow model on one chip.

Measures frame-pairs/sec for the FlyingThings3D evaluation shape (batch 4,
576x960 RGB + 20-bin event voxel + 8192-point clouds — the exact shape
``eval_withocc.py conf/test/things.yaml`` feeds per step; reference
conf/test/things.yaml:15).

The reference publishes no throughput numbers (SURVEY.md §6); the RTX3090
baseline below is an estimate for the reference implementation on its eval
hardware (mean forward time ~0.5 s/batch of 4 -> ~8 frame-pairs/sec), used
only to normalize ``vs_baseline``. The north-star is >=5x that per chip.
(Note: the original target was set per TPU v5p chip; this bench runs on the
available v5e, which has ~1/3 the HBM bandwidth — see PERF.md.)

Derivation (full detail in BASELINE.md "Derivation" section): XLA cost
analysis of this exact forward gives 7.8e11 FLOP / 1.36e11 fused-bytes per
batch; an unfused eager-torch executor materializes ~2.5-4x the fused bytes,
giving 5-8 fps on RTX3090's 936 GB/s, and the published ">8 days" pretrain
schedule bounds eval forward at <~17 fps. 8 fps is the optimistic end of the
unfused band; uncertainty is roughly +/-2x and ``vs_baseline`` inherits it.

Degrade-instead-of-die (VERDICT r2 item 2): the measurement runs in a child
process per Pallas kill-switch configuration. If the all-kernels-on run
produces non-finite output (e.g. a Mosaic toolchain regression — the round-2
failure mode), the ladder retries with per-kernel switches and finally
all-off, and reports the best finite configuration with a ``degraded`` field.
The driver must always receive one JSON line with a finite number as long as
ANY configuration is healthy.

Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "degraded", "pallas_config"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RTX3090_FRAME_PAIRS_PER_SEC_EST = 8.0

# Ladder order: the SHIPPING default first. Each rung costs a full compile
# (~5-6 min fresh on the driver host — observed in the BENCH_r03.json tail;
# seconds when /root/repo/.jax_cache_tpu is warm for the same toolchain),
# and the first rung must be the one that produces a number.
#
# Round-4 rules (VERDICT r3 items 1-2):
#   * rung 1 is the shipping default, which MUST match a committed
#     flagship-shape validation log (triage/, scripts/validate_default.py)
#     — the round-3 failure was twice shipping a default the driver then
#     measured non-finite;
#   * every fallback rung pins ALL graph-shape env vars explicitly, so a
#     leaked environment can never smuggle an unvalidated graph into the
#     conservative rungs (advisor r3: the old xla-only rung inherited the
#     poisoned einsum-1x1 default);
#   * the walk is budget-aware (run_ladder deadline_s): rungs are skipped
#     when the remaining wall-clock cannot fit them, and time is always
#     reserved for the last-resort xla-only rung — round 3 timed out
#     (rc=124) before any known-finite rung ran.
#
# Probe rungs (opt-in RPEFLOW_BENCH_TRY_ALL=1, run after a toolchain
# update): each lifts ONE quarantined graph change so a healed toolchain
# can be detected and the corresponding default flipped.
#: JSON marker recording the last WINNING config measured on THIS host's
#: TPU compile cache ({"label": ..., "env": ..., "ms": ...}). When
#: present, the ladder LEADS with that graph under a capped budget — a
#: warm load+measure is ~100-140 s, while a fresh compile can be 15-44
#: min, so a cache the toolchain invalidated behind our back costs at
#: most the cap before the walk falls back to the default rung (VERDICT
#: r4 item 2: make the best validated config the effective shipping
#: default without gambling the driver window on a cold compile).
#: A seed copy of the marker is COMMITTED (round 5) and restored below if
#: the cache dir was wiped: seg-all-einsum's segmented forward compiles in
#: ~90-150 s even cold (vs 15-44 min for monolith configs), so leading
#: with it is safe under the 420 s cap on any host — a wiped workspace
#: then publishes the best validated config instead of the default rung.
BEST_CONFIG_MARKER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    ".jax_cache_tpu", "best_config.json")
BEST_CONFIG_SEED = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "conf", "bench_best_config_seed.json")

#: per-rung wall-clock cap for the warm lead rung (seconds): triple the
#: observed warm load+measure (~100-140 s incl. process startup)
DWBF16_LEAD_CAP_S = 420.0


def read_best_marker():
    for path in (BEST_CONFIG_MARKER, BEST_CONFIG_SEED):
        try:
            with open(path) as f:
                m = json.load(f)
            if isinstance(m, dict) and m.get("label") and \
                    isinstance(m.get("env"), dict):
                return m
        except (OSError, ValueError):
            continue
    return None


def write_best_marker(label, env, ms):
    try:
        os.makedirs(os.path.dirname(BEST_CONFIG_MARKER), exist_ok=True)
        with open(BEST_CONFIG_MARKER, "w") as f:
            json.dump({"label": label, "env": env, "ms": ms}, f)
    except OSError:
        pass

LADDER = [
    # RPEFLOW_BENCH_EXPECT_MS = validated-history ms/batch for the config
    # (triage/validate_default.log); a reading > 3x it triggers in-child
    # re-measurement (transient host-contention episodes of ~6x were
    # observed 2026-08-21: 1219.8/1115.6 ms readings that re-measured at
    # 177.7/161.4 ms minutes later).
    ("default-corr-fps", {"RPEFLOW_DW_BF16": "0",
                          "RPEFLOW_BENCH_EXPECT_MS": "224"}),
    ("fps-only", {"RPEFLOW_NO_PALLAS_CORR": "1", "RPEFLOW_NO_PALLAS_DW": "1",
                  "RPEFLOW_NO_PALLAS_MDTA": "1", "RPEFLOW_NO_PALLAS_GDFN": "1",
                  "RPEFLOW_CONV1X1_EINSUM": "0", "RPEFLOW_DW_BF16": "0",
                  "RPEFLOW_BENCH_EXPECT_MS": "300"}),
    ("xla-only", {"RPEFLOW_NO_PALLAS": "1", "RPEFLOW_CONV1X1_EINSUM": "0",
                  "RPEFLOW_GROUPED_CONV": "0", "RPEFLOW_DW_IMPL": "flat",
                  "RPEFLOW_DW_BF16": "0", "RPEFLOW_BENCH_EXPECT_MS": "310"}),
]

# Upgrade rungs (VERDICT r3 item 5): tried ONLY AFTER a ladder rung has
# secured a finite number, spending surplus deadline budget; the secured
# result is reported unless the upgrade measures finite, trustworthy AND
# faster. `dw-bf16` is validated finite at 205.2 ms vs the default's
# 224.0 (triage/validate_default.log probe-dw-bf16) but its fresh compile
# ran ~44 min on the probe host — leading the ladder with it cold would
# repeat the round-3 rc=124, while as an upgrade it engages exactly when
# the host's compile cache (or a faster toolchain) makes it affordable.
UPGRADES = [
    # Round 5: segmented forward with the full Pallas set + GLOBAL einsum
    # 1x1 convs — both quarantines are HEALTHY inside per-level jit
    # segments (triage probe-seg-all-einsum-global: finite 148.8 ms =
    # 26.9 fps, the fastest validated config; fuser scope measured
    # 160.3 ms; PERF.md "Round 5"). As an upgrade it composes over the
    # secured rung's env; RPEFLOW_DW_BF16 is reset because the flat-dw
    # form it modifies is replaced by the Pallas dw kernel here.
    # Ordered FIRST: its fresh compile is ~90 s/segmented-forward (vs
    # 15-44 min for dw-bf16's monolith), so on a cold host the best
    # validated config secures its number before the budget-hungry
    # monolith upgrade can eat the remaining deadline.
    ("seg-all-einsum", {"RPEFLOW_SEGMENTED": "1", "RPEFLOW_PALLAS_ALL": "1",
                        "RPEFLOW_CONV1X1_EINSUM": "1",
                        "RPEFLOW_NO_PALLAS": "0", "RPEFLOW_DW_BF16": "0",
                        "RPEFLOW_NO_PALLAS_CORR": "0",
                        "RPEFLOW_NO_PALLAS_DW": "0",
                        "RPEFLOW_NO_PALLAS_MDTA": "0",
                        "RPEFLOW_NO_PALLAS_GDFN": "0",
                        "RPEFLOW_BENCH_EXPECT_MS": "149"}),
    # EXPECT_MS = validated history 158.9-161.5 ms (triage/
    # validate_default.log probe-dw-bf16-tc2*): vs a secured default
    # (~178 ms) the upgrade is worth attempting; vs a secured
    # seg-all-einsum (~148 ms) the skip guard correctly drops it.
    ("dw-bf16", {"RPEFLOW_DW_BF16": "1", "RPEFLOW_BENCH_EXPECT_MS": "161"}),
]
if os.environ.get("RPEFLOW_BENCH_TRY_ALL", "").strip().lower() not in (
        "", "0", "false", "no", "off"):
    LADDER[:0] = [
        ("pallas-all", {"RPEFLOW_PALLAS_ALL": "1"}),
        ("probe-dw", {"RPEFLOW_PALLAS_DW": "1"}),
        ("probe-einsum1x1", {"RPEFLOW_CONV1X1_EINSUM": "1"}),
    ]


def child_main():
    """Measure one configuration in THIS process; print one JSON line.

    Exit code is 0 even for non-finite output — the parent ladder decides.
    Kill switches must already be in the environment (they are read at
    trace time; see rpeflow_tpu/ops/pallas/__init__.py).
    """
    import numpy as np
    import jax

    # TPU compile cache: the unrolled decode graph takes 5-18 min to compile
    # fresh; cached reruns load in seconds. (TPU executables serialize
    # portably, unlike the CPU AOT path that broke the test suite's cache.)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    b, h, w, n = 4, 576, 960, 8192
    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=b, h=h, w=w, n=n, bins=10)

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt)
    )(batch)
    jax.block_until_ready(variables)
    print(f"init+compile(init): {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    import jax.numpy as jnp

    from rpeflow_tpu.model.segmented import make_segmented_forward, segmented_enabled

    if segmented_enabled():
        # Segmented forward (RPEFLOW_SEGMENTED=1): same math as the
        # single-jit apply but grouped into small jits so each compiled
        # module stays below the XLA:TPU tpu_custom_call miscompile scale
        # (model/segmented.py). The eps serial-dependency chain and the
        # finiteness protocol are unchanged; the eps add and the chain
        # reduction run as (pipelined) eager dispatches.
        seg_fwd = make_segmented_forward(model)
        print(f"[bench-child] segmented forward: {seg_fwd.n_segments} "
              "segments", file=sys.stderr)

        def forward(v, bt, eps):
            bt = dict(bt)
            bt["images"] = bt["images"] + eps
            outputs = seg_fwd(v, bt)
            chain = jnp.sum(outputs["flow_2d"][0, 0, :8, 0]) * 1e-30
            return outputs, chain
    else:
        @jax.jit
        def forward(v, bt, eps):
            # `eps` (a scalar carried from the previous iteration's output)
            # is added to the input so every timed iteration forms a serial
            # dependency chain the runtime cannot elide, overlap, or
            # memoize. The original `sum(flow) * 0.0` chain was
            # CONSTANT-FOLDED by a newer XLA (mul-by-zero simplification),
            # which detached the chain from the forward and let the loop
            # measure enqueue time only (2.4 ms/batch, a 58x-impossible
            # reading). `* 1e-30` is numerically just as inert on 255-scale
            # image inputs but cannot legally fold.
            bt = dict(bt)
            bt["images"] = bt["images"] + eps
            outputs, _ = model.apply(v, bt, train=False, compute_mi=False,
                                     compute_loss=False)
            chain = jnp.sum(outputs["flow_2d"][0, 0, :8, 0]) * 1e-30
            return outputs, chain

    def sync(x):
        # block_until_ready can be a no-op under tunneled runtimes; a host
        # readback guarantees the dependency chain actually executed.
        return np.asarray(jax.device_get(x))

    batch = jax.device_put(batch)
    eps = jnp.float32(0.0)
    t0 = time.perf_counter()
    out, eps = forward(variables, batch, eps)
    sync(eps)
    print(f"compile(forward)+first step: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    n_iters = 10

    def measure(round_idx):
        t0 = time.perf_counter()
        out_last = None
        for i in range(n_iters):
            # `eps + 1e-3*(i+1)` makes every iteration's inputs BIT-DISTINCT
            # (1e-3 is representable at 255-scale f32, flow-inert) so a
            # result-memoizing runtime layer can never serve a cached
            # execution; the driver's round-2 log recorded 2.4 ms/batch —
            # iterations 2..10 had bit-identical (v, batch, eps=0.0) args.
            out_last, e = forward(variables, batch,
                                  eps + 1e-3 * (round_idx * n_iters + i + 1))
        # Sync on a REAL output slice of the LAST iteration. The runtime
        # executes in-order (PERF.md honesty probe), so this forces all 10
        # forwards even if the eps chain were ever folded again.
        sync(out_last["flow_2d"][0, 0, :4, 0])
        sync(e)
        return (time.perf_counter() - t0) / n_iters, out_last

    def emit(dt, out_last):
        # Finiteness check over the FULL 2D and 3D flow outputs of the last
        # iteration, read back OUTSIDE the timed window (advisor r2: a
        # 4-element probe would miss NaNs confined to flow_3d / other rows).
        f2d = sync(out_last["flow_2d"])
        f3d = sync(out_last["flow_3d"])
        finite = bool(np.all(np.isfinite(f2d)) and np.all(np.isfinite(f3d)))

        if os.environ.get("RPEFLOW_BENCH_SIMULATE_NANS"):
            # Test hook for the degrade ladder: pretend this configuration
            # is poisoned unless its label is listed in the variable.
            healthy = os.environ["RPEFLOW_BENCH_SIMULATE_NANS"].split(",")
            finite = os.environ.get("RPEFLOW_BENCH_LABEL", "") in healthy

        # Fastest conceivable full forward on one v5e is >>50 ms (measured
        # 138 ms at round 2; HBM roofline in PERF.md puts the floor at
        # ~80 ms for the f32 eval shape). A faster reading means the timing
        # dependency chain broke again — flag it rather than publish
        # silently. NOTE (advisor r2): revise this floor alongside any
        # optimization expected to cross it.
        suspect_timing = dt < 0.05
        print(f"forward: {dt * 1000:.1f} ms/batch of {b} "
              f"(finite={finite})", file=sys.stderr)
        print(json.dumps({
            "ms_per_batch": round(dt * 1000, 2),
            "fps": round(b / dt, 3),
            "finite": finite,
            "suspect_timing": suspect_timing,
        }), flush=True)
        return finite

    # Contention-retry: transient ~6x host-contention episodes were
    # observed (PERF.md round-4 session 2 — 1219.8/1115.6 ms readings that
    # re-measured at 177.7/161.4 ms). When a finite reading is >3x the
    # config's validated history (RPEFLOW_BENCH_EXPECT_MS, set per ladder
    # rung), re-measure after a pause. Every measurement is emitted as its
    # own JSON line immediately (timing paired with its OWN outputs'
    # finiteness — advisor r4: min(dt,dt2) paired with only the latest
    # outputs could discard a valid earlier reading or publish a timing
    # that was never finiteness-checked), so a parent that must kill this
    # child at its budget can still salvage the best reading from partial
    # stdout; the final line re-emitted below is the best FINITE
    # measurement, which is what the parent parses.
    expect_ms = float(os.environ.get("RPEFLOW_BENCH_EXPECT_MS", "0") or 0)
    retries = int(os.environ.get("RPEFLOW_BENCH_CONTENTION_RETRIES", "2"))
    dt, out = measure(0)
    measurements = [(dt, out, emit(dt, out))]
    for r in range(1, retries + 1):
        best = min((m for m in measurements if m[2]),
                   key=lambda m: m[0], default=None)
        cur_dt = best[0] if best else measurements[-1][0]
        if not (best and expect_ms and cur_dt * 1000 > 3 * expect_ms):
            break
        print(f"[bench-child] {cur_dt * 1000:.1f} ms > 3x expected "
              f"{expect_ms:.0f} ms — contention suspected, re-measuring "
              f"({r}/{retries}) after 90s", file=sys.stderr)
        time.sleep(90)
        dt2, out2 = measure(r)
        measurements.append((dt2, out2, emit(dt2, out2)))
    if len(measurements) > 1:
        best = min((m for m in measurements if m[2]),
                   key=lambda m: m[0], default=measurements[-1])
        if best is not measurements[-1]:
            emit(best[0], best[1])


def run_child_config(label, env_extra, budget_s=None, child_cmd=None,
                     min_timeout_s=60.0):
    """Measure one configuration in a child process; parse its LAST JSON line.

    The child emits a JSON line after EVERY measurement (including
    contention re-measures), so a budget kill (TimeoutExpired) can still
    salvage the best reading it printed before dying. ``child_cmd`` and
    ``min_timeout_s`` are overridable for tests.
    """
    env = dict(os.environ)
    env.update(env_extra)
    env["RPEFLOW_BENCH_LABEL"] = label
    timeout = 3000 if budget_s is None \
        else max(min_timeout_s, min(3000.0, budget_s))
    cmd = child_cmd or [sys.executable, os.path.abspath(__file__), "--child"]
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=sys.stderr, text=True)
    try:
        stdout, _ = proc.communicate(timeout=timeout)
        rc = proc.returncode
    except subprocess.TimeoutExpired as e:
        # Kill, then drain: on a loaded host the TimeoutExpired may carry
        # none of the output even though the child printed JSON lines that
        # are still sitting in the OS pipe buffer — a second communicate()
        # after kill() reads both Popen's internal buffers and the pipe,
        # so the salvage below never loses an already-printed measurement.
        proc.kill()
        parts = []
        for chunk in (e.stdout, proc.communicate()[0]):
            if isinstance(chunk, bytes):
                chunk = chunk.decode(errors="replace")
            if chunk:
                parts.append(chunk)
        stdout = "".join(parts)
        rc = 0 if stdout and "{" in stdout else -1
        print(f"[bench] config {label}: TIMEOUT after {timeout:.0f}s"
              + (" (salvaging partial output)" if rc == 0 else ""),
              file=sys.stderr)
    # Last line that parses CLEANLY wins: a budget-killed child can die
    # mid-print, leaving a truncated JSON write as the final line
    # (advisor r4) — fall back to the previous complete line instead of
    # letting json.JSONDecodeError crash the whole bench.
    res = None
    for ln in (stdout or "").strip().splitlines()[::-1]:
        if ln.startswith("{"):
            try:
                res = json.loads(ln)
                break
            except json.JSONDecodeError:
                continue
    if rc != 0 or res is None:
        print(f"[bench] config {label}: child failed rc={rc}",
              file=sys.stderr)
        return None
    print(f"[bench] config {label}: {res}", file=sys.stderr)
    return res


def run_ladder(run_config, ladder=LADDER, deadline_s=None, now=time.monotonic,
               est_rung_s=420.0, reserve_label="xla-only", upgrades=(),
               non_degraded_labels=None):
    """Walk `ladder` until a configuration measures finite & trustworthy.

    `run_config(label, env, budget_s) -> dict | None` runs one measurement
    (dict keys: fps, ms_per_batch, finite, suspect_timing); `budget_s` is
    the wall-clock this rung may spend (None = uncapped). Returns
    (result, label, degraded) for the first healthy config, or
    (best_partial, label, True) if none are — best_partial may be None.

    Budget policy (VERDICT r3 item 1c): with a `deadline_s`, a rung is
    skipped when the remaining time minus a reservation for the
    still-pending last-resort `reserve_label` rung cannot fit one fresh
    compile (`est_rung_s`, ~5-6 min observed on the driver host). The
    reserve guarantees the all-XLA fallback — the rung with the longest
    finite-validation history — always gets its shot before the driver's
    window closes.

    Upgrade policy (round 4): once a rung has SECURED a finite result,
    each `upgrades` entry is attempted with whatever deadline budget
    remains (skipped below a 300 s floor — a warm-cache load+measure).
    Upgrade envs are DELTAS composed over the secured rung's env — so a
    walk that degraded to xla-only gets "xla-only + dw-bf16" (a pure-XLA
    technique), not "default + dw-bf16" with the poisoned kernels back
    on. An upgrade replaces the secured result only when it is finite,
    trustworthy and strictly faster; any timeout/failure costs only
    surplus time, never the secured number.
    """
    t0 = now()
    first_label = ladder[0][0]
    if non_degraded_labels is None:
        non_degraded_labels = {first_label}
    labels = [l for l, _ in ladder]
    secured = None
    secured_env = {}
    for i, (label, env) in enumerate(ladder):
        # optional per-rung wall-clock cap (the dw-bf16 warm lead rung: a
        # warm load is ~2 min but a silently-cold cache compiles 15-44 min
        # — cap it so the fallback rungs keep their window)
        cap = float(env.get("RPEFLOW_BENCH_RUNG_CAP_S", 0) or 0)
        budget = cap if cap > 0 else None
        if deadline_s is not None:
            remaining = deadline_s - (now() - t0)
            reserve = est_rung_s if (label != reserve_label
                                     and reserve_label in labels[i + 1:]) \
                else 0.0
            budget = remaining - reserve if budget is None \
                else min(budget, remaining - reserve)
            needed = 150.0 if cap > 0 else est_rung_s * 0.5
            if budget < needed:
                print(f"[bench] config {label}: SKIPPED "
                      f"(budget {budget:.0f}s < {needed:.0f}s)",
                      file=sys.stderr)
                continue
        res = run_config(label, env, budget)
        if res is None:
            continue
        if res.get("finite") and not res.get("suspect_timing"):
            secured = (res, label, label not in non_degraded_labels)
            secured_env = dict(env)
            res["env"] = dict(env)
            break
    if secured is None:
        return None, None, True

    for up_label, up_delta in upgrades:
        # An upgrade whose validated-history timing (EXPECT_MS) cannot beat
        # the already-secured measurement is a guaranteed loss — skip it
        # rather than spend a (possibly 15-44 min cold) compile on it.
        exp_ms = float(up_delta.get("RPEFLOW_BENCH_EXPECT_MS", 0) or 0)
        cur_ms = secured[0].get("ms_per_batch") or 0
        if exp_ms and cur_ms and exp_ms >= cur_ms:
            print(f"[bench] upgrade {up_label}: SKIPPED (expected "
                  f"{exp_ms:.0f} ms >= secured {cur_ms:.0f} ms)",
                  file=sys.stderr)
            continue
        budget = None
        if deadline_s is not None:
            budget = deadline_s - (now() - t0)
            if budget < 300.0:
                print(f"[bench] upgrade {up_label}: SKIPPED "
                      f"(budget {budget:.0f}s < 300s)", file=sys.stderr)
                continue
        res = run_config(up_label, {**secured_env, **up_delta}, budget)
        if (res and res.get("finite") and not res.get("suspect_timing")
                and res.get("fps", 0) > secured[0].get("fps", 0)):
            # A winning upgrade must PRESERVE the secured rung's degraded
            # flag (advisor r4): if the walk degraded to xla-only and the
            # dw-bf16 upgrade then wins, the run is still degraded — the
            # default rung's Pallas kernels measured non-finite, and the
            # published JSON must keep surfacing that. The composed label
            # records which rung the upgrade ran on top of.
            degraded = secured[2]
            label = f"{secured[1]}+{up_label}" if degraded else up_label
            res["env"] = {**secured_env, **up_delta}
            secured = (res, label, degraded)
    return secured


def plan_ladder(best=None):
    """-> (ladder, upgrades, non_degraded_labels) for this run.

    With a best-config marker from a prior run on this host, a ``-warm``
    lead rung for that config is inserted before the shipping default
    under a budget cap (warm load ~2 min; a silently-cold cache loses at
    most the cap, and the walk falls back to the default rung — which is
    NOT degraded: it is still the validated shipping default).
    """
    ladder = list(LADDER)
    upgrades = list(UPGRADES)
    non_degraded = None
    if best is not None:
        lead_label = f"{best['label']}-warm"
        lead_env = dict(best["env"])
        lead_env.setdefault("RPEFLOW_BENCH_EXPECT_MS",
                            str(best.get("ms") or 160))
        lead_env["RPEFLOW_BENCH_RUNG_CAP_S"] = str(DWBF16_LEAD_CAP_S)
        idx = [l for l, _ in ladder].index("default-corr-fps")
        ladder.insert(idx, (lead_label, lead_env))
        # don't re-try the same config as an upgrade after leading with it
        upgrades = [(l, e) for l, e in upgrades if l != best["label"]]
        non_degraded = {l for l, _ in ladder} - {"fps-only", "xla-only"}
    return ladder, upgrades, non_degraded


def main():
    if "--child" in sys.argv:
        child_main()
        return

    # The driver's total bench window is ~30 min (round-3 run: rc=124 at
    # ~32 min with only 2 of 4 rungs measured). Default deadline leaves
    # headroom for process startup and the final JSON write.
    deadline = float(os.environ.get("RPEFLOW_BENCH_DEADLINE_S", "1500"))
    ladder, upgrades, non_degraded = plan_ladder(read_best_marker())
    res, label, degraded = run_ladder(run_child_config, ladder=ladder,
                                      deadline_s=deadline, upgrades=upgrades,
                                      non_degraded_labels=non_degraded)
    if res is not None and not degraded and isinstance(res.get("env"), dict) \
            and label not in ("default-corr-fps",):
        # record the winning config + its env so the next run on this host
        # (whose TPU cache now holds these executables) can lead with it
        write_best_marker(label.removesuffix("-warm"),
                          {k: v for k, v in res["env"].items()
                           if k != "RPEFLOW_BENCH_RUNG_CAP_S"},
                          res.get("ms_per_batch"))
    if res is None:
        # Nothing healthy anywhere — still emit a parseable line.
        print(json.dumps({
            "metric": "inference_throughput_ft3d_eval",
            "value": 0.0,
            "unit": "frame_pairs_per_sec_per_chip",
            "vs_baseline": 0.0,
            "degraded": True,
            "pallas_config": "none-healthy",
        }))
        sys.exit(1)
    fps = res["fps"]
    print(json.dumps({
        "metric": "inference_throughput_ft3d_eval",
        "value": round(fps, 3),
        "unit": "frame_pairs_per_sec_per_chip",
        "vs_baseline": round(fps / RTX3090_FRAME_PAIRS_PER_SEC_EST, 3),
        "degraded": degraded,
        "pallas_config": label,
    }))


if __name__ == "__main__":
    main()
