"""The bench degrade ladder must always surface a finite number (VERDICT r2 #2).

Round 2 shipped no throughput number because bench.py exited 1 on a
non-finite forward even though the XLA fallback was one kill switch away.
These tests simulate poisoned configurations and assert the ladder walks to
the best healthy one and labels the result as degraded.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import LADDER, run_ladder  # noqa: E402

# The scenario tests exercise the FULL ladder (with the opt-in
# quarantine-lifting rung prepended, as under RPEFLOW_BENCH_TRY_ALL=1) so
# the round-3 fall-through behaviours stay covered.
FULL_LADDER = [("pallas-all", {"RPEFLOW_PALLAS_ALL": "1"})] + list(LADDER)


def _runner(healthy_labels, fps_by_label=None, crash_labels=()):
    calls = []

    def run_config(label, env):
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
    # Simulate the round-3 state: lifting the quarantine NaNs; the
    # quarantined default (corr+fps) heals.
    rc = _runner({"default-corr-fps-dw", "fps-only", "xla-only"})
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert degraded
    assert label == "default-corr-fps-dw"
    assert rc.calls == ["pallas-all", "default-corr-fps-dw"]


def test_total_poisoning_falls_back_to_xla_only():
    rc = _runner({"xla-only"})
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert label == "xla-only" and degraded
    assert rc.calls == [l for l, _ in FULL_LADDER]


def test_child_crash_is_skipped_not_fatal():
    rc = _runner({"default-corr-fps-dw"}, crash_labels={"pallas-all"})
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert label == "default-corr-fps-dw" and degraded


def test_nothing_healthy_returns_none():
    rc = _runner(set())
    res, label, degraded = run_ladder(rc, ladder=FULL_LADDER)
    assert res is None and label is None and degraded


def test_suspect_timing_is_treated_as_unhealthy():
    def run_config(label, env):
        return {"fps": 9999.0, "ms_per_batch": 0.4, "finite": True,
                "suspect_timing": label == "pallas-all"}

    res, label, degraded = run_ladder(run_config, ladder=FULL_LADDER)
    assert label == "default-corr-fps-dw" and degraded


def test_ladder_shape():
    # The shipping default leads (the driver must get a number from the
    # first rung in ONE compile); the quarantine-lifting rung is opt-in.
    labels = [l for l, _ in LADDER]
    assert "pallas-all" not in labels
    assert labels[0] == "default-corr-fps-dw" and dict(LADDER[0][1]) == {}
    assert labels[1] == "no-dw"
    assert labels[-1] == "xla-only"
    assert dict(LADDER[labels.index("xla-only")][1]) == \
        {"RPEFLOW_NO_PALLAS": "1"}
