"""Budget math of the multichip dryrun depth ladder (__graft_entry__).

VERDICT r4 item 4 + advisor r4: the walk must attempt flagship depth when
this host's cache is warm, never exceed the deadline on a cold host, and
clear stale markers when a warm-marked depth fails (toolchain update).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as ge


def _patch(monkeypatch, tmp_path, succeed=(), now=None):
    calls = []

    def fake_child(n_devices, levels, budget_s):
        calls.append((levels, round(budget_s)))
        if now is not None:
            now["t"] += 100.0
        return levels in succeed

    monkeypatch.setattr(ge, "_try_dryrun_child", fake_child)
    if now is not None:
        import time

        monkeypatch.setattr(time, "time", lambda: now["t"])
    return calls


def test_cold_host_attempts_only_four(monkeypatch, tmp_path):
    cache = str(tmp_path)
    now = {"t": 0.0}
    calls = _patch(monkeypatch, tmp_path, succeed={4}, now=now)
    assert ge._dryrun_depth_ladder(8, cache, t_start=0.0)
    # no markers: 6 (1955s est) and 5 (805s) cannot fit 1020-560; 4 can
    assert [c[0] for c in calls] == [4]
    assert ge._depth_is_warm(cache, 4)


def test_warm_six_attempted_first_and_capped(monkeypatch, tmp_path):
    cache = str(tmp_path)
    for lv in (6, 5, 4, 3):
        ge._touch_depth_marker(cache, lv)
    now = {"t": 0.0}
    calls = _patch(monkeypatch, tmp_path, succeed={6}, now=now)
    assert ge._dryrun_depth_ladder(8, cache, t_start=0.0)
    assert calls[0][0] == 6
    assert calls[0][1] <= 420  # warm cap bounds the child budget


def test_warm_failure_clears_markers_and_stops(monkeypatch, tmp_path):
    """A warm-marked depth that fails means the cache was invalidated —
    the walk must clear ALL markers and go straight to the fallback
    instead of burning the cap once per depth."""
    cache = str(tmp_path)
    for lv in (6, 5, 4):
        ge._touch_depth_marker(cache, lv)
    now = {"t": 0.0}
    calls = _patch(monkeypatch, tmp_path, succeed=(), now=now)
    assert not ge._dryrun_depth_ladder(8, cache, t_start=0.0)
    assert [c[0] for c in calls] == [6]
    for lv in (6, 5, 4):
        assert not ge._depth_is_warm(cache, lv)


def test_no_cache_dir_is_cold(monkeypatch, tmp_path):
    now = {"t": 0.0}
    calls = _patch(monkeypatch, tmp_path, succeed=(), now=now)
    assert not ge._dryrun_depth_ladder(8, None, t_start=0.0)
    assert [c[0] for c in calls] == [4]   # cold path, no markers writable
