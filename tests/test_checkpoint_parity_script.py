"""Dry-run of scripts/verify_checkpoint_parity.py with a synthetic checkpoint.

The real proof needs the released ``RPEFlow_things.pt`` + datasets (absent
in this environment — VERDICT r4 missing item 1); this test proves the
whole machinery end to end: torch ``.pt`` -> convert -> strict load ->
eval -> metric comparison vs the README row. Random-init weights must
FAIL parity (that the comparison actually binds) while producing a
complete, finite-or-reported metric table.
"""

import json
import sys
from types import SimpleNamespace

import numpy as np
import pytest
import yaml

from synthetic_data import write_ft3d

pytestmark = pytest.mark.slow


def _tiny_test_cfg(root):
    return {
        "testset": {
            "name": "flyingthings3devent",
            "root_dir": str(root),
            "split": "val",
            "n_workers": 1,
            "n_points": 256,
            "max_depth": 35.0,
            "event_bins": 2,
            "event_polarity": True,
            "augmentation": {"enabled": False},
            "n_resample": 1,
        },
        "model": {
            "name": "RPEFlow",
            "batch_size": 2,
            "freeze_bn": False,
            "n_samples": [128, 64, 32, 16, 8],
            "ids": {"enabled": True, "sensor_size_divisor": 32},
            "pwc2d": {
                "event_bins": 2, "event_polarity": True,
                "norm": {"feature_pyramid": "batch_norm",
                         "flow_estimator": None, "context_network": None},
                "max_displacement": 4,
            },
            "pwc3d": {
                "norm": {"feature_pyramid": "batch_norm", "correlation": None,
                         "flow_estimator": None},
                "k": 8,
            },
            "loss2d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2"},
            "loss3d": {"level_weights": [8, 4, 2, 1, 0.5], "order": "l2"},
        },
        "ckpt": {"path": None, "strict": True},
    }


def test_verify_checkpoint_parity_dry_run(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    import jax

    sys.path.insert(0, "scripts")
    import verify_checkpoint_parity as vcp

    from rpeflow_tpu.compat.torch_loader import to_torch_state_dict
    from rpeflow_tpu.train.config import ConfigNode
    from rpeflow_tpu.train.factory import model_factory

    root = tmp_path / "data"
    write_ft3d(str(root), "val", 2, seed=3)

    cfg = _tiny_test_cfg(root)
    cfg_path = tmp_path / "test.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # synthetic "reference" checkpoint: random-init tiny model, exported to
    # a torch state_dict in the reference's {state_dict, ...} schema
    model = model_factory(ConfigNode(cfg["model"]))
    rng = np.random.RandomState(0)
    batch = {
        "images": (rng.rand(1, 128, 128, 6) * 255).astype(np.float32),
        "pcs": np.concatenate([
            rng.rand(1, 256, 3).astype(np.float32) * [4, 4, 20] + [0, 0, 2],
        ] * 2, axis=-1).astype(np.float32),
        "event_voxel": rng.rand(1, 128, 128, 4).astype(np.float32),
        "intrinsics": np.array([[100.0, 63.5, 63.5]], np.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
        batch, train=True, compute_mi=True, compute_loss=False)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in to_torch_state_dict(variables).items()}
    ckpt_path = tmp_path / "synthetic.pt"
    torch.save({"last_epoch": 0, "last_step": 0, "state_dict": sd,
                "best_metrics": None}, str(ckpt_path))

    args = SimpleNamespace(
        weights=str(ckpt_path), benchmark="things", config=str(cfg_path),
        data_root=None, max_batches=1, n_resample=0, batch_size=0,
        rel_tol_epe2d=vcp.EPE_2D_REL_TOL, rel_tol_epe3d=vcp.EPE_3D_REL_TOL,
        abs_tol_pct=vcp.PCT_ABS_TOL)
    rc = vcp.run(args)
    out = capsys.readouterr().out
    report = json.loads(out[out.index("{"):])

    # random weights must fail the README-row comparison — the assert binds
    assert rc == 1 and report["pass"] is False
    # ...but the machinery produced the full metric table
    assert set(report["metrics"]) == set(vcp.EXPECTED["things"]["metrics"])
    for name, row in report["metrics"].items():
        assert row["expected"] == vcp.EXPECTED["things"]["metrics"][name]
