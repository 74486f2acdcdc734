"""Segmented evaluator path (RPEFLOW_SEGMENTED / `model.segmented` YAML).

The segmented forward must produce the same dataset-level metrics as the
single-jit evaluator — it is the same math regrouped into smaller jits
(model/segmented.py; the TPU motivation is the tpu_custom_call
context-miscompile, but the path must be correct everywhere).
"""

import numpy as np
import pytest
import yaml

from synthetic_data import write_ft3d
from test_checkpoint_parity_script import _tiny_test_cfg

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    torch = pytest.importorskip("torch")
    import jax

    from rpeflow_tpu.compat.torch_loader import to_torch_state_dict
    from rpeflow_tpu.train.config import ConfigNode
    from rpeflow_tpu.train.factory import model_factory

    tmp = tmp_path_factory.mktemp("segeval")
    root = tmp / "data"
    write_ft3d(str(root), "val", 2, seed=5)
    cfg = _tiny_test_cfg(root)

    model = model_factory(ConfigNode(cfg["model"]))
    rng = np.random.RandomState(0)
    batch = {
        "images": (rng.rand(1, 128, 128, 6) * 255).astype(np.float32),
        "pcs": np.concatenate(
            [rng.rand(1, 256, 3).astype(np.float32) * [4, 4, 20] + [0, 0, 2]] * 2,
            axis=-1).astype(np.float32),
        "event_voxel": rng.rand(1, 128, 128, 4).astype(np.float32),
        "intrinsics": np.array([[100.0, 63.5, 63.5]], np.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
        batch, train=True, compute_mi=True, compute_loss=False)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in to_torch_state_dict(variables).items()}
    ckpt = tmp / "w.pt"
    torch.save({"last_epoch": 0, "last_step": 0, "state_dict": sd,
                "best_metrics": None}, str(ckpt))
    cfg["ckpt"]["path"] = str(ckpt)
    return cfg


def _run(cfg_dict, monkeypatch, segmented):
    from rpeflow_tpu.train.config import ConfigNode
    from rpeflow_tpu.train.evaluator import Evaluator

    cfg = ConfigNode(cfg_dict)
    if segmented:
        cfg.model.set_dotted("segmented", "true")
        # pre-seed the kernel-set envs (what the YAML opt-in would choose)
        # through monkeypatch so they are RESTORED at teardown — the
        # evaluator's auto-default would otherwise leak them into later
        # tests in this process
        monkeypatch.setenv("RPEFLOW_PALLAS_ALL", "1")
        monkeypatch.setenv("RPEFLOW_CONV1X1_EINSUM", "1")
    monkeypatch.delenv("RPEFLOW_SEGMENTED", raising=False)
    return Evaluator(cfg, with_occ=True).run()


def test_segmented_evaluator_matches_single_jit(eval_setup, monkeypatch):
    ref = _run(eval_setup, monkeypatch, segmented=False)
    seg = _run(eval_setup, monkeypatch, segmented=True)
    for k in ("EPE2d", "1px", "Fl", "EPE3d", "5cm", "10cm"):
        assert np.isfinite(seg[k])
        np.testing.assert_allclose(seg[k], ref[k], rtol=2e-3, atol=1e-3)
