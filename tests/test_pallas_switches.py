"""Kill-switch parsing (advisor r2: '0' must NOT disable Pallas) and the
round-3 mdta/gdfn quarantine precedence (ops/pallas/__init__.py)."""

import rpeflow_tpu.ops.pallas as pk

ALL_SWITCHES = (
    "RPEFLOW_NO_PALLAS", "RPEFLOW_NO_PALLAS_CORR", "RPEFLOW_NO_PALLAS_FPS",
    "RPEFLOW_NO_PALLAS_MDTA", "RPEFLOW_NO_PALLAS_GDFN",
    "RPEFLOW_PALLAS_ALL", "RPEFLOW_PALLAS_MDTA", "RPEFLOW_PALLAS_GDFN",
)


def _clear(monkeypatch):
    for name in ALL_SWITCHES:
        monkeypatch.delenv(name, raising=False)


def test_default_enabled_except_quarantined(monkeypatch):
    _clear(monkeypatch)
    assert pk.pallas_enabled()
    for k in pk.KERNEL_CLASSES:
        assert pk.pallas_enabled(k) == (k not in pk.QUARANTINED)


def test_falsey_values_leave_enabled(monkeypatch):
    _clear(monkeypatch)
    for v in ("0", "false", "no", "off", "", " 0 ", "FALSE"):
        monkeypatch.setenv("RPEFLOW_NO_PALLAS", v)
        assert pk.pallas_enabled(), f"value {v!r} must not disable"


def test_truthy_master_disables_everything(monkeypatch):
    _clear(monkeypatch)
    monkeypatch.setenv("RPEFLOW_NO_PALLAS", "1")
    assert not pk.pallas_enabled()
    for k in pk.KERNEL_CLASSES:
        assert not pk.pallas_enabled(k)
    # ... even when the quarantine lift is also set: NO wins
    monkeypatch.setenv("RPEFLOW_PALLAS_ALL", "1")
    for k in pk.KERNEL_CLASSES:
        assert not pk.pallas_enabled(k)


def test_per_kernel_switch_is_scoped(monkeypatch):
    _clear(monkeypatch)
    monkeypatch.setenv("RPEFLOW_NO_PALLAS_CORR", "1")
    assert pk.pallas_enabled() and not pk.pallas_enabled("corr")
    assert pk.pallas_enabled("fps")


def test_quarantine_lift_all(monkeypatch):
    _clear(monkeypatch)
    monkeypatch.setenv("RPEFLOW_PALLAS_ALL", "1")
    for k in pk.KERNEL_CLASSES:
        assert pk.pallas_enabled(k)
    # explicit per-kernel NO still wins over the lift
    monkeypatch.setenv("RPEFLOW_NO_PALLAS_MDTA", "1")
    assert not pk.pallas_enabled("mdta")
    assert pk.pallas_enabled("gdfn")


def test_quarantine_lift_single(monkeypatch):
    _clear(monkeypatch)
    monkeypatch.setenv("RPEFLOW_PALLAS_MDTA", "1")
    assert pk.pallas_enabled("mdta")
    assert not pk.pallas_enabled("gdfn")
    for k in ("corr", "fps"):
        assert pk.pallas_enabled(k)


def test_unknown_kernel_class_raises():
    import pytest

    with pytest.raises(ValueError):
        pk.pallas_enabled("nope")
