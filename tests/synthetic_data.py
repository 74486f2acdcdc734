"""Synthetic on-disk dataset trees for tests (no real datasets in env).

One writer per benchmark family, emitting exactly the preprocessed-HDF5
formats the readers consume:

  * ``write_ft3d``   — FlyingThings3DEvent preprocessed samples
                       (reference scripts/convert_flyingthings3d_subset_hdf5.py
                       output schema).
  * ``write_kubric`` — EKubric ``sf_preprocess`` sequence trees
                       (reference scripts/convert_kubric_hdf5.py schema).
  * ``write_dsec``   — DSEC ``train_preprocess_pc`` sequence trees
                       (reference dsec.py:640-718 self-writing cache schema).

Shared by the dataset-class tests (tests/test_datasets_synthetic.py) and the
end-to-end CLI tests (tests/test_end_to_end.py) so the format lives in one
place.
"""

import os

import h5py
import numpy as np


def write_ft3d(root, split, n_items, h=128, w=128, n_pts=400, bins=2, seed=0):
    """Preprocessed-format HDF5 samples the FT3D reader understands."""
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


def write_kubric(root, n_seqs=3, frames=2, h=64, w=96, n_pts=300, bins=2):
    """EKubric preprocessed sequence trees (``sf_preprocess/<seq>/...``)."""
    for s in range(n_seqs):
        seq = f"seq{s:03d}"
        d = os.path.join(root, "sf_preprocess", seq)
        os.makedirs(d, exist_ok=True)
        rng = np.random.RandomState(s)
        for i in range(frames):
            pc1 = rng.rand(n_pts, 3).astype(np.float32) * 5
            pc1[:, 2] += 2
            with h5py.File(os.path.join(d, f"{i:05d}_preprocessed.hdf5"), "w") as f:
                f["image1"] = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                f["image2"] = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                f["event_voxel"] = rng.rand(h, w, 2 * bins).astype(np.float32)
                f["flow_2d"] = rng.randn(h, w, 2).astype(np.float32)
                f["flow_2d_mask"] = np.ones((h, w), bool)
                f["flow_3d"] = (rng.randn(n_pts, 3) * 0.05).astype(np.float32)
                f["nooccmask_2d"] = np.ones((h, w), np.float32)
                f["nooccmask_3d"] = (rng.rand(n_pts) > 0.2).astype(np.float32)
                f["pc1"] = pc1
                f["pc2"] = pc1 + 0.05
                f["metadata"] = np.float32([[100.0, 100.0, w / 2, h / 2]])


def write_dsec(root, seqs=("zurich_city_01_a", "thun_00_a"), frames=2,
               h=64, w=96, bins=2):
    """DSEC preprocessed sequence trees (``train_preprocess_pc/<seq>/...``)."""
    pre = os.path.join(root, "train_preprocess_pc")
    for seq in seqs:
        d = os.path.join(pre, seq)
        os.makedirs(d, exist_ok=True)
        rng = np.random.RandomState(abs(hash(seq)) % 2 ** 31)
        for i in range(frames):
            disp = (rng.rand(h, w).astype(np.float32) * 20 + 5)
            with h5py.File(os.path.join(d, f"{i:06d}.hdf5"), "w") as f:
                for k, size in [("x", 500), ("y", 500), ("t", 500), ("p", 500)]:
                    f[f"events_{k}"] = rng.rand(size).astype(np.float32)
                f["event_voxel"] = rng.rand(2 * bins, h, w).astype(np.float32)
                f["image1"] = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                f["image2"] = (rng.rand(h, w, 3) * 255).astype(np.uint8)
                f["flow12"] = rng.randn(h, w, 2).astype(np.float32)
                f["flow12_valid"] = np.ones((h, w), bool)
                f["disp1"] = disp
                f["disp2"] = disp + 0.5
                f["intrinsics"] = np.float32([100.0, 100.0, w / 2, h / 2])
                f["perspectives"] = np.float32(
                    [[1, 0, 0, -w / 2], [0, 1, 0, -h / 2],
                     [0, 0, 0, 100.0], [0, 0, 1.0 / 0.6, 0]])
