"""Data-pipeline parity tests: event voxelization, augmentation, occlusion
masks and the loader, each against the upstream reference as oracle
(imported from the read-only mount, running its pure-numpy/torch paths).
"""

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
# the reference augmentation module imports torchvision (absent here) only
# for ColorJitter, which these tests never exercise — stub it out.
sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

from rpeflow_tpu.data.augmentation import (
    crop_image_with_pc,
    flip_optical_flow,
    flip_point_cloud,
    joint_augmentation,
    resize_sparse_flow_map,
)
from rpeflow_tpu.data.event_voxel import events_to_voxel
from rpeflow_tpu.data.flow_utils import (
    flow_warp_numpy,
    get_occu_mask_backward,
    get_occu_mask_bidirection,
)
from rpeflow_tpu.data.loader import DataLoader
from rpeflow_tpu.train.config import ConfigNode


def _rand_events(rng, n=5000, h=32, w=48):
    ev = np.zeros((n, 4), np.float32)
    ev[:, 0] = rng.randint(0, w, n)
    ev[:, 1] = rng.randint(0, h, n)
    ev[:, 2] = np.sort(rng.rand(n)) * 0.05
    ev[:, 3] = rng.randint(0, 2, n)
    return ev


@pytest.mark.parametrize("polarity", [False, True])
def test_event_voxel_matches_reference(rng, polarity):
    import event_utils as ref_ev

    ev = _rand_events(rng)
    mine = events_to_voxel(ev, num_bins=5, height=32, width=48,
                           event_polarity=polarity)
    ref = ref_ev.eventsToVoxel(ev.copy(), num_bins=5, height=32, width=48,
                               event_polarity=polarity, temporal_bilinear=True)
    # reference emits [C, H, W]; ours is [H, W, C]
    np.testing.assert_allclose(mine.transpose(2, 0, 1), ref, atol=1e-3)


def test_flip_point_cloud_matches_reference(rng):
    import augmentation as ref_aug

    pc = rng.rand(100, 3).astype(np.float32) + [0, 0, 3]
    for mode in ("lr", "ud"):
        mine = flip_point_cloud(pc, 64, 96, 100.0, 47.5, 31.5, mode)
        ref = ref_aug.flip_point_cloud(pc, 64, 96, 100.0, 47.5, 31.5, mode)
        np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_flip_optical_flow_matches_reference(rng):
    import augmentation as ref_aug

    flow = rng.randn(16, 24, 3).astype(np.float32)
    for mode in ("lr", "ud"):
        np.testing.assert_allclose(
            flip_optical_flow(flow.copy(), mode),
            ref_aug.flip_optical_flow(flow.copy(), mode), atol=1e-6)


def test_crop_matches_reference(rng):
    import augmentation as ref_aug

    img1 = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    img2 = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
    pc1 = rng.rand(200, 3).astype(np.float32) + [0, 0, 2]
    pc2 = rng.rand(200, 3).astype(np.float32) + [0, 0, 2]
    flow2d = rng.randn(40, 60, 3).astype(np.float32)
    flow3d = rng.randn(200, 3).astype(np.float32)
    win = [5, 3, 45, 35]

    mine = crop_image_with_pc(img1, img2, pc1, pc2, flow2d, flow3d,
                              100.0, 29.5, 19.5, win)
    ref = ref_aug.crop_image_with_pc(img1, img2, pc1, pc2, flow2d, flow3d,
                                     100.0, 29.5, 19.5, win)
    for m, r in zip(mine[:6], ref[:6]):
        np.testing.assert_allclose(m, r, atol=1e-5)
    assert mine[6:9] == tuple(ref[6:9])


def test_resize_sparse_flow_matches_reference(rng):
    import augmentation as ref_aug

    flow = rng.randn(20, 30, 3).astype(np.float32)
    flow[..., 2] = (rng.rand(20, 30) > 0.5).astype(np.float32)
    np.testing.assert_allclose(
        resize_sparse_flow_map(flow, 60, 40),
        ref_aug.resize_sparse_flow_map(flow, 60, 40), atol=1e-5)


def test_joint_augmentation_seeded_parity(rng):
    """With the same global numpy seed, the full augmentation chain must
    consume the same random draws and produce identical outputs."""
    import augmentation as ref_aug

    cfg = ConfigNode({
        "enabled": True,
        "color_jitter": {"enabled": False},
        "random_horizontal_flip": {"enabled": True},
        "random_vertical_flip": {"enabled": True},
        "random_crop": {"enabled": False},
        "random_scale": {"enabled": False},
    })
    img1 = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    img2 = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    pc1 = rng.rand(64, 3).astype(np.float32) + [0, 0, 2]
    pc2 = rng.rand(64, 3).astype(np.float32) + [0, 0, 2]
    flow2d = rng.randn(32, 48, 3).astype(np.float32)
    flow3d = rng.randn(64, 3).astype(np.float32)
    event = rng.rand(32, 48, 4).astype(np.float32)

    np.random.seed(7)
    mine = joint_augmentation(img1.copy(), img2.copy(), pc1.copy(), pc2.copy(),
                              flow2d.copy(), flow3d.copy(), 100.0, 23.5, 15.5,
                              cfg, event=event.copy())
    np.random.seed(7)
    ref = ref_aug.joint_augmentation(img1.copy(), img2.copy(), pc1.copy(),
                                     pc2.copy(), flow2d.copy(), flow3d.copy(),
                                     100.0, 23.5, 15.5, cfg, event=event.copy())
    # reference returns (img1, img2, pc1, pc2, flow2d, flow3d, f, cx, cy, event)
    for m, r in zip(mine[:6], ref[:6]):
        np.testing.assert_allclose(np.asarray(m, np.float64),
                                   np.asarray(r, np.float64), atol=1e-5)
    np.testing.assert_allclose(mine[9], ref[9], atol=1e-5)


def test_occlusion_masks_match_reference(rng):
    import utils as ref_utils

    flow12 = rng.randn(24, 32, 2).astype(np.float32) * 3
    flow21 = -flow12 + rng.randn(24, 32, 2).astype(np.float32) * 0.3
    mine = get_occu_mask_bidirection(flow12, flow21)
    ref = ref_utils.get_occu_mask_bidirection(flow12, flow21)
    assert np.mean(mine != ref) < 0.02  # tie pixels at the threshold may flip

    import torch

    t21 = torch.from_numpy(flow21.transpose(2, 0, 1))[None]
    ref_b = ref_utils.get_occu_mask_backward(t21)[0, 0].numpy()
    mine_b = get_occu_mask_backward(flow21)
    assert np.mean(mine_b != ref_b) < 0.02


def test_flow_warp_numpy_matches_reference(rng):
    import utils as ref_utils

    img = rng.rand(20, 30, 2).astype(np.float32)
    flow = rng.randn(20, 30, 2).astype(np.float32) * 2
    for mode in ("nearest", "bilinear"):
        np.testing.assert_allclose(
            flow_warp_numpy(img, flow, 0, mode),
            ref_utils.flow_warp_numpy(img, flow, 0, mode), atol=1e-4)


class _ToyDataset:
    def __len__(self):
        return 23

    def __getitem__(self, i):
        return {"x": np.full((3,), i, np.float32), "index": np.int32(i)}


def test_loader_basics():
    ds = _ToyDataset()
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == 5 == len(loader)
    np.testing.assert_array_equal(batches[0]["index"], [0, 1, 2, 3])
    assert batches[0]["x"].shape == (4, 3)

    # shuffling is reproducible per epoch and differs across epochs
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=1)
    loader.set_epoch(0)
    a = np.concatenate([b["index"] for b in loader])
    loader.set_epoch(0)
    b = np.concatenate([b["index"] for b in loader])
    loader.set_epoch(1)
    c = np.concatenate([b["index"] for b in loader])
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_loader_sharding():
    ds = _ToyDataset()
    shards = []
    for r in range(2):
        loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True,
                            shard_index=r, num_shards=2)
        shards.append(np.concatenate([b["index"] for b in loader]))
    assert all(len(s) == 10 for s in shards)
    merged = sorted(np.concatenate(shards).tolist())
    assert merged == list(range(20))


def test_loader_process_pool_matches_single_producer():
    """num_workers>1 forks a process pool; deterministic datasets must
    produce byte-identical batches in the same order as the single-producer
    path."""
    ds = _ToyDataset()
    single = DataLoader(ds, batch_size=4, shuffle=True, drop_last=False,
                        seed=3, num_workers=1)
    pooled = DataLoader(ds, batch_size=4, shuffle=True, drop_last=False,
                        seed=3, num_workers=3, use_process_pool=True)
    single.set_epoch(2)
    pooled.set_epoch(2)
    a = list(single)
    b = list(pooled)
    assert len(a) == len(b) == len(single)
    for ba, bb in zip(a, b):
        assert set(ba) == set(bb)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])


def test_loader_spawn_pool_matches_single_producer(tmp_path):
    """cfgs-reconstructible datasets use the SPAWN pool (workers rebuild
    the dataset — no fork of the JAX-loaded parent); deterministic eval
    datasets must produce byte-identical batches vs the single producer."""
    from synthetic_data import write_ft3d

    from rpeflow_tpu.data import FlyingThings3DEvent
    from rpeflow_tpu.data.loader import default_use_process_pool
    from rpeflow_tpu.train.config import ConfigNode

    write_ft3d(str(tmp_path), "val", 5)
    cfg = ConfigNode({
        "name": "flyingthings3devent", "root_dir": str(tmp_path),
        "split": "val", "n_points": 64, "max_depth": 35.0,
        "event_bins": 2, "event_polarity": True,
        "augmentation": {"enabled": False},
    })
    ds = FlyingThings3DEvent(cfg)
    # policy: light preprocessed readers default to the threaded producer
    assert default_use_process_pool(ds) is False

    single = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    pooled = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                        use_process_pool=True)
    try:
        pooled._ensure_pool()
        assert pooled._pool_is_spawn, \
            "FT3D should take the spawn pool (cfgs-reconstructible)"
        a, b = list(single), list(pooled)
        assert len(a) == len(b) == len(single)
        for ba, bb in zip(a, b):
            assert set(ba) == set(bb)
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])
        # the pool persists across epochs (one startup cost, not per epoch)
        first_pool = pooled._pool
        pooled.set_epoch(1)
        assert len(list(pooled)) == len(single)
        assert pooled._pool is first_pool
    finally:
        pooled.close()


def test_color_jitter_ops_vs_float_oracle(rng):
    """Photometric ops vs exact float formulas.

    brightness/contrast/saturation are exact blends (same formulas as
    torchvision); hue goes through cv2's uint8 HSV (180 hue steps = 2
    degrees/step) — torchvision uses float HSV, so the hue op carries a
    small quantization error. This pins both: exactness of the blends and
    a bound on the hue quantization (measured max ~10/255, mean ~1.2).
    torchvision itself is not installable in this image; the float-HSV
    oracle below is the same algorithm it implements.
    """
    from matplotlib.colors import hsv_to_rgb, rgb_to_hsv

    from rpeflow_tpu.data.augmentation import (
        _adjust_brightness,
        _adjust_contrast,
        _adjust_hue,
        _adjust_saturation,
    )

    img = (rng.rand(48, 64, 3) * 255).astype(np.float32)

    np.testing.assert_allclose(
        _adjust_brightness(img, 1.3), np.clip(img * 1.3, 0, 255), atol=1e-3)

    import cv2

    gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(
        _adjust_contrast(img, 0.7),
        np.clip(0.7 * img + 0.3 * gray.mean(), 0, 255), atol=1e-3)
    np.testing.assert_allclose(
        _adjust_saturation(img, 1.4),
        np.clip(1.4 * img + (1 - 1.4) * gray[..., None], 0, 255), atol=1e-3)

    for factor in (-0.1, -0.03, 0.03, 0.1):
        got = _adjust_hue(img, factor)
        hsv = rgb_to_hsv(img / 255.0)
        hsv[..., 0] = (hsv[..., 0] + factor) % 1.0
        ref = hsv_to_rgb(hsv) * 255.0
        d = np.abs(got - ref)
        assert d.max() <= 16.0, d.max()
        assert d.mean() <= 2.5, d.mean()
