"""End-to-end integration: synthetic FT3D-format data -> train 1 epoch ->
checkpoint -> evaluate.

Exercises the full L3-L5 stack (dataset factory, preprocessed-HDF5 reader,
loader, trainer with GSPMD step, orbax checkpointing, evaluator with
dataset-weighted metrics) without the real datasets.
"""

import os

import h5py
import numpy as np
import pytest

from rpeflow_tpu.train.config import ConfigNode


def _write_synthetic_ft3d(root, split, n_items, h=128, w=128, n_pts=400,
                          bins=2, seed=0):
    """Write preprocessed-format HDF5 samples the FT3D reader understands."""
    rng = np.random.RandomState(seed)
    pre_dir = os.path.join(root, f"{split}_preprocess_ev{bins}_1", "left")
    os.makedirs(pre_dir, exist_ok=True)
    for i in range(n_items):
        pc1 = rng.rand(n_pts, 3).astype(np.float32)
        pc1[:, 2] = pc1[:, 2] * 20 + 2
        flow3d = rng.randn(n_pts, 3).astype(np.float32) * 0.05
        with h5py.File(os.path.join(pre_dir, "%07d_preprocessed.hdf5" % i), "w") as f:
            f["image1"] = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            f["image2"] = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            f["event_voxel"] = rng.rand(h, w, 2 * bins).astype(np.float32)
            f["flow_2d"] = rng.randn(h, w, 2).astype(np.float32)
            f["flow_mask_2d"] = np.ones((h, w), bool)
            f["flow_3d"] = flow3d
            f["occ_mask_3d"] = (rng.rand(n_pts) > 0.8).astype(np.uint8)
            f["pc1"] = pc1
            f["pc2"] = (pc1 + flow3d).astype(np.float32)


def _cfg(root, log_dir):
    ds = {
        "name": "flyingthings3devent",
        "root_dir": root,
        "n_workers": 1,
        "n_points": 256,
        "max_depth": 35.0,
        "event_bins": 2,
        "event_polarity": True,
        "augmentation": {
            "enabled": True,
            "color_jitter": {"enabled": False},
            "random_horizontal_flip": {"enabled": True},
            "random_vertical_flip": {"enabled": False},
            "random_crop": {"enabled": False},
            "random_scale": {"enabled": False},
        },
    }
    val = dict(ds)
    val["split"] = "val"
    val["augmentation"] = {"enabled": False}
    train = dict(ds)
    train["split"] = "train"
    train["drop_last"] = True
    return ConfigNode({
        "trainset": train,
        "valset": val,
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
        "training": {
            "max_epochs": 1,
            "optimizer": "adam",
            "lr": {"scheduler": "MultiStepLR", "init_value": 1e-4,
                   "momentum": 0.9, "decay_rate": 0.5,
                   "decay_milestones": [100]},
            "weight_decay": 1e-6,
            "bias_decay": 0.0,
        },
        "log": {"dir": log_dir, "run_name": "e2e", "save_ckpt": True,
                "save_ckpt_every_n_epochs": 1},
        "ckpt": {"path": None, "resume": False},
        "amp": False,
    })


@pytest.mark.slow
def test_train_and_eval_end_to_end(tmp_path):
    root = str(tmp_path / "data")
    _write_synthetic_ft3d(root, "train", 4)
    _write_synthetic_ft3d(root, "val", 2, seed=1)
    log_dir = str(tmp_path / "logs")

    from rpeflow_tpu.train.trainer import Trainer

    cfgs = _cfg(root, log_dir)
    trainer = Trainer(cfgs)
    trainer.run()

    assert trainer.best_metrics is not None
    assert os.path.isdir(os.path.join(log_dir, "best"))
    assert os.path.isdir(os.path.join(log_dir, "epoch-001"))
    assert os.path.isfile(os.path.join(log_dir, "train.log"))

    # evaluate from the saved checkpoint
    from rpeflow_tpu.train.evaluator import Evaluator

    eval_cfg = ConfigNode({
        "testset": cfgs.valset.to_dict(),
        "model": cfgs.model.to_dict(),
        "ckpt": {"path": os.path.join(log_dir, "best"), "strict": True},
    })
    results = Evaluator(eval_cfg, with_occ=True).run()
    for key in ("EPE2d", "1px", "Fl", "EPE3d", "5cm", "10cm",
                "EPE3d_noc", "5cm_noc", "10cm_noc"):
        assert np.isfinite(results[key]), key


def test_trainer_amp_fails_fast(tmp_path):
    """'amp: true' must error out with guidance BEFORE any compilation:
    every bf16 scope trips an XLA:TPU fusion miscompile at the flagship
    shape (PERF.md 'bf16 decode-fuser experiment')."""
    root = str(tmp_path / "data")
    _write_synthetic_ft3d(root, "train", 2)
    _write_synthetic_ft3d(root, "val", 1, seed=1)

    from rpeflow_tpu.train.trainer import Trainer

    cfgs = _cfg(root, str(tmp_path / "logs"))
    cfgs.amp = True
    with pytest.raises(NotImplementedError, match="miscompile"):
        Trainer(cfgs)
