"""The bench degrade ladder must always surface a finite number (VERDICT r2 #2).

Round 2 shipped no throughput number because bench.py exited 1 on a
non-finite forward even though the XLA fallback was one kill switch away.
Round 3 shipped none because the walk ran out of wall-clock (rc=124)
before any known-finite rung ran. These tests simulate poisoned
configurations and shrinking time budgets and assert the ladder walks to
the best healthy configuration, labels the result degraded, and always
reserves time for the last-resort xla-only rung.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import LADDER, run_ladder  # noqa: E402

# The scenario tests exercise the FULL ladder (with the opt-in probe rungs
# prepended, as under RPEFLOW_BENCH_TRY_ALL=1) so the fall-through
# behaviours stay covered.
PROBES = [
    ("pallas-all", {"RPEFLOW_PALLAS_ALL": "1"}),
    ("probe-dw", {"RPEFLOW_PALLAS_DW": "1"}),
    ("probe-einsum1x1", {"RPEFLOW_CONV1X1_EINSUM": "1"}),
]
FULL_LADDER = PROBES + list(LADDER)


def _runner(healthy_labels, fps_by_label=None, crash_labels=()):
    calls = []

    def run_config(label, env, budget_s=None):
        calls.append(label)
        if label in crash_labels:
            return None
        return {
            "fps": (fps_by_label or {}).get(label, 10.0),
            "ms_per_batch": 100.0,
            "finite": label in healthy_labels,
            "suspect_timing": False,
        }

    run_config.calls = calls
    return run_config


def test_healthy_first_config_is_not_degraded():
    rc = _runner({"pallas-all"})
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert label == "pallas-all" and not degraded
    assert rc.calls == ["pallas-all"]  # no wasted child runs
    assert res["finite"]


def test_poisoned_kernel_falls_through_to_quarantined_default():
    # Simulate the round-3 state: lifting the quarantines NaNs; the
    # quarantined default (corr+fps, flat-dw, no einsum-1x1) heals.
    rc = _runner({"default-corr-fps", "fps-only", "xla-only"})
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert degraded
    assert label == "default-corr-fps"
    assert rc.calls == ["pallas-all", "probe-dw", "probe-einsum1x1",
                        "default-corr-fps"]


def test_total_poisoning_falls_back_to_xla_only():
    rc = _runner({"xla-only"})
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert label == "xla-only" and degraded
    assert rc.calls == [l for l, _ in FULL_LADDER]


def test_child_crash_is_skipped_not_fatal():
    rc = _runner({"default-corr-fps"}, crash_labels={"pallas-all"})
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert label == "default-corr-fps" and degraded


def test_nothing_healthy_returns_none():
    rc = _runner(set())
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert res is None and label is None and degraded


def test_suspect_timing_is_treated_as_unhealthy():
    def run_config(label, env, budget_s=None):
        return {"fps": 9999.0, "ms_per_batch": 0.4, "finite": True,
                "suspect_timing": label == "pallas-all"}

    res, label, degraded = run_ladder(run_config, ladder=FULL_LADDER)
    assert label == "probe-dw" and degraded  # next rung after the suspect one


def test_ladder_shape():
    # The shipping default leads (the driver must get a number from the
    # first rung in ONE compile); the probe rungs are opt-in; the fallback
    # rungs pin every graph-shape env var explicitly so a leaked
    # environment can't smuggle an unvalidated graph into them.
    labels = [l for l, _ in LADDER]
    assert "pallas-all" not in labels
    # rung 1 is the validated shipping default — the only env it pins is
    # the dw-bf16 upgrade switch (so a leaked RPEFLOW_DW_BF16=1 cannot turn
    # the secured rung into the 44-min-compile graph)
    assert labels[0] == "default-corr-fps"
    assert dict(LADDER[0][1]) == {"RPEFLOW_DW_BF16": "0",
                                  "RPEFLOW_BENCH_EXPECT_MS": "224"}
    assert labels[-1] == "xla-only"
    xla_env = dict(LADDER[labels.index("xla-only")][1])
    assert xla_env["RPEFLOW_NO_PALLAS"] == "1"
    assert xla_env["RPEFLOW_CONV1X1_EINSUM"] == "0"
    assert xla_env["RPEFLOW_DW_BF16"] == "0"
    fps_env = dict(LADDER[labels.index("fps-only")][1])
    assert fps_env["RPEFLOW_CONV1X1_EINSUM"] == "0"
    assert fps_env["RPEFLOW_NO_PALLAS_CORR"] == "1"
    assert fps_env["RPEFLOW_DW_BF16"] == "0"


class _FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_budget_skips_to_reserved_xla_only():
    """Round-3 regression: with only ~one rung of time left, the walk must
    jump straight to the reserved xla-only rung instead of burning the
    window on earlier rungs."""
    clock = _FakeClock()
    calls = []

    def run_config(label, env, budget_s=None):
        calls.append((label, budget_s))
        clock.t += 400.0  # each rung costs ~400s
        return {"fps": 10.0, "ms_per_batch": 100.0,
                "finite": label == "xla-only", "suspect_timing": False}

    res, label, degraded = run_ladder(
        run_config, ladder=FULL_LADDER, deadline_s=500.0, now=clock,
        est_rung_s=400.0)
    assert label == "xla-only" and degraded
    # 500s total with a 400s reserve leaves no earlier rung a meaningful
    # budget; everything is skipped until the reserved rung, which gets
    # the full remaining window.
    assert calls == [("xla-only", 500.0)]


def test_budget_reserves_time_for_xla_only_even_mid_walk():
    clock = _FakeClock()
    calls = []

    def run_config(label, env, budget_s=None):
        calls.append(label)
        clock.t += 300.0
        return {"fps": 10.0, "ms_per_batch": 100.0, "finite": False,
                "suspect_timing": False}

    run_ladder(run_config, ladder=list(LADDER), deadline_s=700.0, now=clock,
               est_rung_s=300.0)
    # default (300s) fits with 300s reserved; fps-only's post-reserve
    # budget (100s) is below the half-compile floor, so it is skipped and
    # xla-only still runs inside the window.
    assert calls == ["default-corr-fps", "xla-only"]


def test_no_deadline_means_no_skipping():
    rc = _runner({"xla-only"})
    res, label, degraded = run_ladder(rc, ladder=list(LADDER))
    assert rc.calls == [l for l, _ in LADDER]
    assert label == "xla-only"


def test_upgrade_replaces_secured_result_when_faster():
    rc = _runner({"default-corr-fps", "dw-bf16"},
                 fps_by_label={"default-corr-fps": 17.9, "dw-bf16": 19.5})
    res, label, degraded = run_ladder(
        rc, ladder=list(LADDER), upgrades=[("dw-bf16", {"RPEFLOW_DW_BF16": "1"})])
    assert label == "dw-bf16" and not degraded
    assert res["fps"] == 19.5
    assert rc.calls == ["default-corr-fps", "dw-bf16"]


def test_upgrade_failure_keeps_secured_result():
    for bad in ({"default-corr-fps"},            # upgrade non-finite
                None):                           # upgrade child crash
        rc = _runner(bad or {"default-corr-fps"},
                     crash_labels=() if bad else {"dw-bf16"},
                     fps_by_label={"default-corr-fps": 17.9, "dw-bf16": 19.5})
        res, label, degraded = run_ladder(
            rc, ladder=list(LADDER),
            upgrades=[("dw-bf16", {"RPEFLOW_DW_BF16": "1"})])
        assert label == "default-corr-fps" and not degraded
        assert res["fps"] == 17.9


def test_upgrade_slower_is_not_reported():
    rc = _runner({"default-corr-fps", "dw-bf16"},
                 fps_by_label={"default-corr-fps": 17.9, "dw-bf16": 16.0})
    res, label, _ = run_ladder(
        rc, ladder=list(LADDER), upgrades=[("dw-bf16", {})])
    assert label == "default-corr-fps" and res["fps"] == 17.9


def test_upgrade_skipped_below_budget_floor():
    clock = _FakeClock()
    calls = []

    def run_config(label, env, budget_s=None):
        calls.append(label)
        clock.t += 1250.0
        return {"fps": 17.9, "ms_per_batch": 223.0, "finite": True,
                "suspect_timing": False}

    res, label, degraded = run_ladder(
        run_config, ladder=list(LADDER), deadline_s=1500.0, now=clock,
        upgrades=[("dw-bf16", {})])
    # 250s remain after the secured rung — under the 300s warm-load floor
    assert calls == ["default-corr-fps"]
    assert label == "default-corr-fps" and not degraded


def test_upgrade_not_attempted_when_nothing_secured():
    rc = _runner(set())
    res, label, degraded = run_ladder(
        rc, ladder=list(LADDER), upgrades=[("dw-bf16", {})])
    assert res is None and degraded
    assert "dw-bf16" not in rc.calls


def _lead_ladder():
    from bench import plan_ladder

    ladder, _, non_degraded = plan_ladder(
        {"label": "dw-bf16", "env": {"RPEFLOW_DW_BF16": "1"}, "ms": 161.4})
    return ladder, non_degraded


def test_plan_ladder_without_marker_matches_static():
    from bench import UPGRADES, plan_ladder

    ladder, upgrades, nd = plan_ladder(None)
    assert ladder == list(LADDER)
    assert upgrades == list(UPGRADES)
    assert nd is None


def test_plan_ladder_with_marker_inserts_capped_lead():
    from bench import DWBF16_LEAD_CAP_S, plan_ladder

    best = {"label": "seg-all-einsum",
            "env": {"RPEFLOW_SEGMENTED": "1", "RPEFLOW_PALLAS_ALL": "1",
                    "RPEFLOW_CONV1X1_EINSUM": "fuser"},
            "ms": 160.3}
    ladder, upgrades, nd = plan_ladder(best)
    labels = [l for l, _ in ladder]
    assert labels[0] == "seg-all-einsum-warm"
    lead_env = dict(ladder[0][1])
    assert lead_env["RPEFLOW_BENCH_RUNG_CAP_S"] == str(DWBF16_LEAD_CAP_S)
    assert lead_env["RPEFLOW_SEGMENTED"] == "1"
    # the winning config is not re-tried as an upgrade
    assert "seg-all-einsum" not in [l for l, _ in upgrades]
    assert "dw-bf16" in [l for l, _ in upgrades]
    assert nd == set(labels) - {"fps-only", "xla-only"}


def test_best_marker_roundtrip(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "BEST_CONFIG_MARKER",
                        str(tmp_path / "best_config.json"))
    monkeypatch.setattr(bench, "BEST_CONFIG_SEED",
                        str(tmp_path / "seed.json"))
    assert bench.read_best_marker() is None
    bench.write_best_marker("dw-bf16", {"RPEFLOW_DW_BF16": "1"}, 161.4)
    m = bench.read_best_marker()
    assert m["label"] == "dw-bf16" and m["env"]["RPEFLOW_DW_BF16"] == "1"
    # corrupt marker is ignored, not fatal
    (tmp_path / "best_config.json").write_text("{truncated")
    assert bench.read_best_marker() is None


def test_best_marker_seed_fallback(tmp_path, monkeypatch):
    """A wiped cache dir falls back to the COMMITTED seed marker, so a
    fresh workspace still leads the ladder with the best validated
    config (round-5 workspace-recreation lesson)."""
    import json

    import bench

    monkeypatch.setattr(bench, "BEST_CONFIG_MARKER",
                        str(tmp_path / "best_config.json"))
    seed = tmp_path / "seed.json"
    seed.write_text(json.dumps(
        {"label": "seg-all-einsum",
         "env": {"RPEFLOW_SEGMENTED": "1"}, "ms": 146.5}))
    monkeypatch.setattr(bench, "BEST_CONFIG_SEED", str(seed))
    m = bench.read_best_marker()
    assert m["label"] == "seg-all-einsum"
    # a live host marker takes precedence over the seed
    bench.write_best_marker("dw-bf16", {"RPEFLOW_DW_BF16": "1"}, 161.4)
    assert bench.read_best_marker()["label"] == "dw-bf16"
    # the repo's actual committed seed parses and plans a lead rung
    monkeypatch.setattr(
        bench, "BEST_CONFIG_MARKER", str(tmp_path / "nope.json"))
    monkeypatch.setattr(bench, "BEST_CONFIG_SEED", bench.__file__.replace(
        "bench.py", "conf/bench_best_config_seed.json"))
    m = bench.read_best_marker()
    assert m and m["label"]
    ladder, _, nd = bench.plan_ladder(m)
    assert ladder[0][0] == f"{m['label']}-warm"
    assert ladder[0][0] in nd


def test_warm_lead_rung_secures_not_degraded():
    ladder, nd = _lead_ladder()
    rc = _runner({"dw-bf16-warm", "default-corr-fps"})
    res, label, degraded = run_ladder(rc, ladder=ladder,
                                      non_degraded_labels=nd)
    assert label == "dw-bf16-warm" and not degraded
    assert rc.calls == ["dw-bf16-warm"]


def test_warm_lead_failure_falls_back_to_default_not_degraded():
    """A silently-cold cache kills the lead rung at its cap; the walk must
    fall back to the shipping default WITHOUT labeling the run degraded
    (the default is still the validated shipping graph)."""
    ladder, nd = _lead_ladder()
    rc = _runner({"default-corr-fps"}, crash_labels={"dw-bf16-warm"})
    res, label, degraded = run_ladder(rc, ladder=ladder,
                                      non_degraded_labels=nd)
    assert label == "default-corr-fps" and not degraded


def test_lead_rung_budget_is_capped():
    from bench import DWBF16_LEAD_CAP_S

    ladder, nd = _lead_ladder()
    clock = _FakeClock()
    budgets = {}

    def run_config(label, env, budget_s=None):
        budgets[label] = budget_s
        clock.t += 100.0
        return {"fps": 20.0, "ms_per_batch": 160.0, "finite": True,
                "suspect_timing": False}

    res, label, _ = run_ladder(run_config, ladder=ladder, deadline_s=3000.0,
                               now=clock, non_degraded_labels=nd)
    # generous deadline: the cap (not the full window) bounds the lead rung
    assert budgets["dw-bf16-warm"] == DWBF16_LEAD_CAP_S


def test_run_child_config_salvages_partial_output_on_timeout():
    """A child killed at its budget must still yield the JSON line(s) it
    already printed (the contention-retry protocol emits one per
    measurement exactly so this salvage works)."""
    import sys as _sys

    from bench import run_child_config

    child = [_sys.executable, "-u", "-c",
             "import json,time;"
             "print(json.dumps({'ms_per_batch': 500.0, 'fps': 8.0,"
             " 'finite': True, 'suspect_timing': False}), flush=True);"
             "time.sleep(300)"]
    # 10 s budget: python child startup alone can exceed 3 s on a loaded
    # 1-core host, making a tighter budget flakily kill the child before
    # it prints anything (observed 2026-08-21)
    res = run_child_config("fake", {}, budget_s=10.0, child_cmd=child,
                           min_timeout_s=10.0)
    assert res is not None and res["finite"] and res["fps"] == 8.0


def test_run_child_config_timeout_with_no_output_is_none():
    import sys as _sys

    from bench import run_child_config

    child = [_sys.executable, "-u", "-c", "import time; time.sleep(300)"]
    res = run_child_config("fake", {}, budget_s=3.0, child_cmd=child,
                           min_timeout_s=3.0)
    assert res is None


def test_ladder_pins_expected_ms_for_contention_retry():
    from bench import LADDER, UPGRADES

    for label, env in list(LADDER) + list(UPGRADES):
        assert float(env["RPEFLOW_BENCH_EXPECT_MS"]) > 0, label


def test_upgrade_env_composes_with_secured_rung():
    """If the walk degraded to xla-only, the upgrade must run on TOP of the
    xla-only pins (dw-bf16 is a pure-XLA technique) — not re-enable the
    poisoned Pallas default."""
    envs = {}

    def run_config(label, env, budget_s=None):
        envs[label] = dict(env)
        return {"fps": 20.0 if label == "dw-bf16" else 10.0,
                "ms_per_batch": 100.0,
                "finite": label in ("xla-only", "dw-bf16"),
                "suspect_timing": False}

    res, label, degraded = run_ladder(
        run_config, ladder=list(LADDER),
        upgrades=[("dw-bf16", {"RPEFLOW_DW_BF16": "1"})])
    # the winning upgrade must keep the secured rung's degraded flag
    # (advisor r4: the default rung's kernels measured non-finite and the
    # published JSON must keep saying so) and name the rung it composed
    # over.
    assert label == "xla-only+dw-bf16" and res["fps"] == 20.0
    assert degraded
    up = envs["dw-bf16"]
    assert up["RPEFLOW_DW_BF16"] == "1"          # the delta
    assert up["RPEFLOW_NO_PALLAS"] == "1"        # inherited xla-only pin
    assert up["RPEFLOW_CONV1X1_EINSUM"] == "0"
