"""Kill-switch parsing (advisor r2: '0' must NOT disable Pallas)."""

import rpeflow_tpu.ops.pallas as pk


def test_default_enabled(monkeypatch):
    for name in ("RPEFLOW_NO_PALLAS", "RPEFLOW_NO_PALLAS_CORR",
                 "RPEFLOW_NO_PALLAS_FPS", "RPEFLOW_NO_PALLAS_MDTA",
                 "RPEFLOW_NO_PALLAS_GDFN"):
        monkeypatch.delenv(name, raising=False)
    assert pk.pallas_enabled()
    for k in pk.KERNEL_CLASSES:
        assert pk.pallas_enabled(k)


def test_falsey_values_leave_enabled(monkeypatch):
    for v in ("0", "false", "no", "off", "", " 0 ", "FALSE"):
        monkeypatch.setenv("RPEFLOW_NO_PALLAS", v)
        assert pk.pallas_enabled(), f"value {v!r} must not disable"


def test_truthy_master_disables_everything(monkeypatch):
    monkeypatch.setenv("RPEFLOW_NO_PALLAS", "1")
    assert not pk.pallas_enabled()
    for k in pk.KERNEL_CLASSES:
        assert not pk.pallas_enabled(k)


def test_per_kernel_switch_is_scoped(monkeypatch):
    monkeypatch.delenv("RPEFLOW_NO_PALLAS", raising=False)
    monkeypatch.setenv("RPEFLOW_NO_PALLAS_MDTA", "1")
    assert pk.pallas_enabled() and not pk.pallas_enabled("mdta")
    for k in ("corr", "fps", "gdfn"):
        assert pk.pallas_enabled(k)
    monkeypatch.delenv("RPEFLOW_NO_PALLAS_MDTA", raising=False)


def test_unknown_kernel_class_raises():
    import pytest

    with pytest.raises(ValueError):
        pk.pallas_enabled("nope")
