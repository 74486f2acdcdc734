"""Dataset-class tests over synthetic on-disk trees (no real datasets).

Covers the preprocessed fast paths of KubricData and DSEC (reader format,
split logic, filtering, fixed-shape outputs) and the DSEC EventSlicer /
flow codec against the reference's formats.
"""

import os

import h5py
import numpy as np
import pytest

from rpeflow_tpu.train.config import ConfigNode
from synthetic_data import write_dsec, write_kubric

H, W, NPTS = 64, 96, 300


def test_kubric_preprocessed(tmp_path):
    from rpeflow_tpu.data import KubricData

    root = str(tmp_path)
    write_kubric(root, n_seqs=5)
    base = {
        "root_dir": root, "event_bins": 2, "event_polarity": True,
        "max_flow": 250.0, "max_depth": 90.0, "max_3dflow": 5.0,
        "n_points": 128, "augmentation": {"enabled": False},
    }
    train = KubricData(ConfigNode({**base, "split": "train"}))
    val = KubricData(ConfigNode({**base, "split": "val"}))
    full = KubricData(ConfigNode({**base, "split": "full"}))
    # 5 seqs: idx%5==0 -> val (1 seq), others train (4 seqs); 2 frames each
    assert len(full) == 10 and len(train) == 8 and len(val) == 2

    item = train[0]
    assert item["images"].shape == (H, W, 6)
    assert item["pcs"].shape == (128, 6)
    assert item["flow_3d"].shape == (128, 3)
    assert item["event_voxel"].shape == (H, W, 4)
    assert item["flow_2d"].shape == (H, W, 2)
    assert item["occ_mask_3d"].shape == (128,)
    assert np.isfinite(item["pcs"]).all()


def test_dsec_preprocessed(tmp_path):
    from rpeflow_tpu.data import DSECPreprocessTrain

    root = str(tmp_path)
    write_dsec(root)
    cfg = ConfigNode({
        "root_dir": root, "split": "val", "data_seq": "full", "isbi": False,
        "n_workers": 1, "max_depth": 35, "max_flow": 100, "max_3dflow": 2.0,
        "n_points": 128, "use_preprocess": True, "event_bins": 2,
        "event_polarity": True, "augmentation": {"enabled": False},
    })
    ds = DSECPreprocessTrain(cfg)
    # zurich_city_01_a is a val sequence, thun_00_a is train
    assert len(ds) == 2
    item = ds[0]
    assert item["images"].shape == (H, W, 6)
    assert item["pcs"].shape == (128, 6)
    assert item["flow_3d"].shape == (128, 4)    # 4th channel = valid mask
    assert item["flow_2d"].shape == (H, W, 3)   # 3rd channel = valid mask
    assert item["event_voxel"].shape == (H, W, 4)
    assert np.isfinite(item["pcs"]).all()

    cfg_train = cfg.merge({"split": "train"})
    assert len(DSECPreprocessTrain(cfg_train)) == 2


def test_dsec_flow_codec_roundtrip(rng):
    from rpeflow_tpu.data.dsec import flow_16bit_to_float

    flow = rng.randn(20, 30, 2) * 10
    valid = rng.rand(20, 30) > 0.3
    enc = np.zeros((20, 30, 3), np.uint16)
    enc[..., 0] = (flow[..., 0] * 128 + 2 ** 15).astype(np.uint16)
    enc[..., 1] = (flow[..., 1] * 128 + 2 ** 15).astype(np.uint16)
    enc[..., 2] = valid.astype(np.uint16)
    enc[~valid] = 0
    dec, valid2d = flow_16bit_to_float(enc)
    np.testing.assert_array_equal(valid2d, valid)
    np.testing.assert_allclose(dec[valid], flow[valid], atol=1 / 64)


def test_event_slicer(tmp_path):
    from rpeflow_tpu.data.dsec import EventSlicer

    n = 10000
    rng = np.random.RandomState(0)
    t = np.sort(rng.randint(0, 1_000_000, n)).astype(np.int64)  # us
    path = str(tmp_path / "events.h5")
    with h5py.File(path, "w") as f:
        f["events/t"] = t
        f["events/x"] = rng.randint(0, 640, n).astype(np.uint16)
        f["events/y"] = rng.randint(0, 480, n).astype(np.uint16)
        f["events/p"] = rng.randint(0, 2, n).astype(np.uint8)
        ms = np.searchsorted(t, np.arange(1001) * 1000, side="left")
        f["ms_to_idx"] = ms.astype(np.int64)
        f["t_offset"] = np.int64(500)

    with h5py.File(path, "r") as f:
        slicer = EventSlicer(f)
        ev = slicer.get_events(200_500, 300_500)  # gps time; offset 500
        assert ev is not None
        # exact window semantics: 200000 <= t_raw < 300000
        assert (ev["t"] - 500 >= 200_000).all()
        assert (ev["t"] - 500 < 300_000).all()
        expected = np.sum((t >= 200_000) & (t < 300_000))
        assert len(ev["t"]) == expected
        assert slicer.get_final_time_us() == int(t[-1]) + 500
