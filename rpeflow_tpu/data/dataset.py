"""Dataset protocol + composition.

Host-side datasets return dicts of channels-last numpy arrays with FIXED
shapes per dataset (TPU batches must be static):

  images       [H, W, 6] uint8/float32
  pcs          [N, 6] float32
  event_voxel  [H, W, 2*bins] float32
  flow_2d      [H, W, 2|3] float32
  flow_3d      [N, 3|4] float32
  occ_mask_3d  [N] uint8/float32
  intrinsics   [3] float32
  index        scalar int

``ConcatDataset`` mirrors the reference's up-to-3-trainset concatenation
(reference factory.py:24-37).
"""

from __future__ import annotations

import bisect
from typing import Dict, List, Sequence

import numpy as np


class Dataset:
    """Minimal map-style dataset protocol."""

    #: Seed offset for deterministic eval-time point resampling. The
    #: reference evaluates VARIABLE-size clouds (every point,
    #: eval_withocc.py:64-100); TPU batches are static-shape, so eval items
    #: are resampled to ``n_points``, which carries an ~8-10% metric spread
    #: across draws (scripts/quantify_eval_deviations.py). Setting
    #: ``testset.n_resample: K`` makes the evaluator average over K seeded
    #: draws (seeds 0..K-1 via this attribute), collapsing that spread.
    resample_seed: int = 0

    def set_resample_seed(self, seed: int) -> None:
        self.resample_seed = int(seed)

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        raise NotImplementedError


class ConcatDataset(Dataset):
    def __init__(self, datasets: Sequence[Dataset]):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        self.cumulative: List[int] = []
        total = 0
        for d in self.datasets:
            total += len(d)
            self.cumulative.append(total)

    def set_resample_seed(self, seed: int) -> None:
        for d in self.datasets:
            d.set_resample_seed(seed)

    def __len__(self) -> int:
        return self.cumulative[-1]

    def __getitem__(self, i: int):
        if i < 0:
            i += len(self)
        ds_idx = bisect.bisect_right(self.cumulative, i)
        prev = self.cumulative[ds_idx - 1] if ds_idx > 0 else 0
        return self.datasets[ds_idx][i - prev]


def sample_points_to_fixed(
    rng: np.random.RandomState,
    n_points: int,
    pc: np.ndarray,
    *aligned: np.ndarray,
):
    """Random-choice resample a cloud (and aligned arrays) to ``n_points``.

    Mirrors the reference's train-time sampling (flyingthings3d.py:89-93):
    sampling WITH replacement only when the cloud is smaller than the target.
    """
    n = pc.shape[0]
    idx = rng.choice(n, size=n_points, replace=n < n_points)
    out = [pc[idx]]
    for a in aligned:
        out.append(a[idx])
    return out if aligned else out[0]
