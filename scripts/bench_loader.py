#!/usr/bin/env python
"""DSEC loader throughput at realistic scale (VERDICT round-1 weak item 9).

Builds a synthetic DSEC ``train_preprocess_pc`` sequence at the real sensor
resolution (480x640, 15-bin voxel, ~500k events), then measures items/s of
the full __getitem__ pipeline (HDF5 read + disparity->point-cloud lifting +
resample + voxel assembly) through the DataLoader in thread and process-pool
modes. The question: can the host feed one TPU chip running eval at
~29 frame-pairs/s?

    python scripts/bench_loader.py [--items 48] [--keep]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 480, 640


def build(root: str, n_items: int) -> None:
    d = os.path.join(root, "train_preprocess_pc", "thun_00_a")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n_items):
        disp = rng.rand(H, W).astype(np.float32) * 30 + 5
        with h5py.File(os.path.join(d, f"{i:06d}.hdf5"), "w") as f:
            n_ev = 500_000
            f["events_x"] = (rng.rand(n_ev) * W).astype(np.float32)
            f["events_y"] = (rng.rand(n_ev) * H).astype(np.float32)
            f["events_t"] = np.sort(rng.rand(n_ev)).astype(np.float32)
            f["events_p"] = rng.randint(0, 2, n_ev).astype(np.float32)
            f["event_voxel"] = rng.rand(15, H, W).astype(np.float32)
            f["image1"] = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            f["image2"] = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            f["flow12"] = rng.randn(H, W, 2).astype(np.float32)
            f["flow12_valid"] = np.ones((H, W), bool)
            f["disp1"] = disp
            f["disp2"] = disp + 0.5
            f["intrinsics"] = np.float32([569.0, 569.0, W / 2, H / 2])
            f["perspectives"] = np.float32(
                [[1, 0, 0, -W / 2], [0, 1, 0, -H / 2],
                 [0, 0, 0, 569.0], [0, 0, 1.0 / 0.6, 0]])


def bench(root: str, n_workers: int, use_pool: bool, batch_size: int = 4):
    from rpeflow_tpu.data.loader import DataLoader
    from rpeflow_tpu.data import DSECPreprocessTrain
    from rpeflow_tpu.train.config import ConfigNode

    cfg = ConfigNode({
        "root_dir": root, "split": "train", "data_seq": "full", "isbi": False,
        "n_workers": n_workers, "max_depth": 35, "max_flow": 100,
        "max_3dflow": 2.0, "n_points": 8192, "use_preprocess": True,
        "event_bins": 15, "event_polarity": False,
        "augmentation": {"enabled": False},
    })
    ds = DSECPreprocessTrain(cfg)
    loader = DataLoader(ds, batch_size, shuffle=False, num_workers=n_workers,
                        use_process_pool=use_pool)
    # warmup epoch (page cache, pool forks)
    for _ in loader:
        pass
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch["images"].shape[0]
    dt = time.perf_counter() - t0
    tag = f"pool x{n_workers}" if use_pool else f"thread x{n_workers}"
    print(f"{tag:12s}: {n / dt:6.1f} items/s  ({dt / n * 1000:.1f} ms/item)")
    return n / dt


def build_raw_dsec(root: str, n_items: int, seq: str = "thun_00_a",
                   n_ev_per_item: int = 200_000) -> None:
    """Synthetic RAW DSEC sequence tree: 16-bit flow/disparity PNGs, image
    PNGs, an EventSlicer-format events.h5 (+ rectify map) and the
    calibration YAML — so DSECTrain's raw path (PNG decode + ms-indexed
    event slicing + rectification + trilinear voxelize + disparity->cloud
    lifting) runs end to end per item."""
    import cv2
    import yaml

    rng = np.random.RandomState(0)
    d = os.path.join(root, "train", seq)
    for sub in ("flow/forward", "flow/backward", "disparity/event",
                "images/left/ev_inf", "events/left", "calibration"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)

    t0_us, dt_us = 1_000_000, 100_000
    bounds = [t0_us + k * dt_us for k in range(n_items + 1)]

    fwd_ts = [(bounds[i], bounds[i + 1]) for i in range(n_items)]
    np.savetxt(os.path.join(d, "flow", "forward_timestamps.txt"),
               np.array(fwd_ts, "int64"), fmt="%d", delimiter=",")
    np.savetxt(os.path.join(d, "flow", "backward_timestamps.txt"),
               np.array([(b, a) for a, b in fwd_ts], "int64"),
               fmt="%d", delimiter=",")
    np.savetxt(os.path.join(d, "disparity", "timestamps.txt"),
               np.array(bounds, "int64"), fmt="%d")
    np.savetxt(os.path.join(d, "images", "timestamps.txt"),
               np.array(bounds, "int64"), fmt="%d")

    flow = np.zeros((H, W, 3), np.uint16)
    flow[..., 0] = (rng.randn(H, W) * 3 * 128 + 2 ** 15).astype(np.uint16)
    flow[..., 1] = (rng.randn(H, W) * 3 * 128 + 2 ** 15).astype(np.uint16)
    flow[..., 2] = 1
    disp = ((rng.rand(H, W) * 25 + 10) * 256).astype(np.uint16)
    img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    flow_bgr = np.ascontiguousarray(flow[..., ::-1])
    for i in range(n_items):
        cv2.imwrite(os.path.join(d, "flow", "forward", f"{i:06d}.png"),
                    flow_bgr)
        cv2.imwrite(os.path.join(d, "flow", "backward", f"{i:06d}.png"),
                    flow_bgr)
    for k in range(n_items + 1):
        cv2.imwrite(os.path.join(d, "disparity", "event", f"{k:06d}.png"),
                    disp)
        cv2.imwrite(os.path.join(d, "images", "left", "ev_inf",
                                 f"{k:06d}.png"), img)

    n_ev = n_ev_per_item * n_items
    dur_us = bounds[-1] - bounds[0]
    t_rel = np.sort(rng.randint(0, dur_us, n_ev)).astype("int64")
    with h5py.File(os.path.join(d, "events", "left", "events.h5"), "w") as f:
        f["events/x"] = rng.randint(0, W, n_ev).astype(np.uint16)
        f["events/y"] = rng.randint(0, H, n_ev).astype(np.uint16)
        f["events/t"] = t_rel
        f["events/p"] = rng.randint(0, 2, n_ev).astype(np.uint8)
        n_ms = dur_us // 1000 + 2
        f["ms_to_idx"] = np.searchsorted(
            t_rel, np.arange(n_ms) * 1000).astype("int64")
        f["t_offset"] = np.int64(t0_us)
    rect = np.stack(np.meshgrid(np.arange(W, dtype=np.float32),
                                np.arange(H, dtype=np.float32)), axis=-1)
    with h5py.File(os.path.join(d, "events", "left", "rectify_map.h5"),
                   "w") as f:
        f["rectify_map"] = rect

    calib = {
        "intrinsics": {"camRect0": {
            "camera_matrix": [569.0, 569.0, W / 2, H / 2]}},
        "disparity_to_depth": {"cams_03": [
            [1, 0, 0, -W / 2], [0, 1, 0, -H / 2],
            [0, 0, 0, 569.0], [0, 0, 1.0 / 0.6, 0]]},
    }
    with open(os.path.join(d, "calibration", "cam_to_cam.yaml"), "w") as f:
        yaml.safe_dump(calib, f)


def bench_raw_dsec(root: str, n_workers: int, use_pool: bool,
                   batch_size: int = 4):
    from rpeflow_tpu.data import DSECTrain
    from rpeflow_tpu.data.loader import DataLoader
    from rpeflow_tpu.train.config import ConfigNode

    cfg = ConfigNode({
        "root_dir": root, "split": "train", "data_seq": "full", "isbi": False,
        "n_workers": n_workers, "max_depth": 35, "max_flow": 100,
        "max_3dflow": 2.0, "n_points": 8192, "use_preprocess": False,
        "event_bins": 15, "event_polarity": False,
        "augmentation": {"enabled": False},
    })
    ds = DSECTrain(cfg)
    loader = DataLoader(ds, batch_size, shuffle=False, num_workers=n_workers,
                        use_process_pool=use_pool)
    for _ in loader:   # warmup epoch (page cache, pool startup)
        pass
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch["images"].shape[0]
    dt = time.perf_counter() - t0
    tag = f"pool x{n_workers}" if use_pool else f"thread x{n_workers}"
    print(f"{tag:12s}: {n / dt:6.1f} items/s  ({dt / n * 1000:.1f} ms/item)")
    loader.close()
    return n / dt


def bench_ft3d(root: str, n_workers: int, use_pool: bool, batch_size: int = 4):
    """Preprocessed-FT3D loader throughput at flagship scale (540x960,
    8192 points, 20ch event voxel — the eval pipeline's item shape)."""
    from rpeflow_tpu.data import FlyingThings3DEvent
    from rpeflow_tpu.data.loader import DataLoader
    from rpeflow_tpu.train.config import ConfigNode

    cfg = ConfigNode({
        "name": "flyingthings3devent", "root_dir": root, "split": "val",
        "n_workers": n_workers, "n_points": 8192, "max_depth": 35.0,
        "event_bins": 10, "event_polarity": True,
        "augmentation": {"enabled": False},
    })
    ds = FlyingThings3DEvent(cfg)
    loader = DataLoader(ds, batch_size, shuffle=False, num_workers=n_workers,
                        use_process_pool=use_pool)
    for _ in loader:   # warmup epoch (page cache, pool startup)
        pass
    t0 = time.perf_counter()
    n = 0
    for batch in loader:
        n += batch["images"].shape[0]
    dt = time.perf_counter() - t0
    tag = f"pool x{n_workers}" if use_pool else f"thread x{n_workers}"
    print(f"{tag:12s}: {n / dt:6.1f} items/s  ({dt / n * 1000:.1f} ms/item)")
    loader.close()
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=48)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--mode", choices=("dsec", "ft3d", "rawdsec", "both",
                                       "all"), default="both")
    args = ap.parse_args()

    if args.mode in ("rawdsec", "all"):
        root = tempfile.mkdtemp(prefix="dsec_raw_loader_bench_")
        try:
            t = time.time()
            build_raw_dsec(root, args.items)
            print(f"[dsec-raw] built {args.items} synthetic raw items in "
                  f"{time.time() - t:.0f}s ({H}x{W}, 200k events/window)")
            # raw DSEC defaults to the process pool
            # (loader.default_use_process_pool); measure thread x1 as the
            # per-item cost reference, then the pool default
            for n_workers, pool in [(1, False), (2, True), (4, True)]:
                bench_raw_dsec(root, n_workers, pool)
        finally:
            if not args.keep:
                shutil.rmtree(root, ignore_errors=True)

    if args.mode in ("dsec", "both"):
        root = tempfile.mkdtemp(prefix="dsec_loader_bench_")
        try:
            t = time.time()
            build(root, args.items)
            print(f"[dsec-preprocessed] built {args.items} synthetic items in "
                  f"{time.time() - t:.0f}s ({H}x{W}, 15-bin voxel, 500k "
                  "events each)")
            for n_workers, pool in [(1, False), (2, False), (2, True), (4, True)]:
                bench(root, n_workers, pool)
        finally:
            if not args.keep:
                shutil.rmtree(root, ignore_errors=True)

    if args.mode in ("ft3d", "both"):
        import sys as _sys
        _sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                         "..", "tests"))
        from synthetic_data import write_ft3d

        root = tempfile.mkdtemp(prefix="ft3d_loader_bench_")
        try:
            t = time.time()
            write_ft3d(root, "val", args.items, h=540, w=960, n_pts=8192,
                       bins=10)
            print(f"[ft3d-preprocessed] built {args.items} synthetic items "
                  f"in {time.time() - t:.0f}s (540x960, 20ch voxel, 8192 pts)")
            for n_workers, pool in [(1, False), (2, False), (4, True)]:
                bench_ft3d(root, n_workers, pool)
        finally:
            if not args.keep:
                shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
