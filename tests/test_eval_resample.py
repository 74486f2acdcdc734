"""Resample-averaged eval (`testset.n_resample`, VERDICT r2 item 6).

The reference evaluates variable-size clouds point-for-point
(reference eval_withocc.py:64-100); static TPU shapes force a fixed
n_points draw with an ~8-10% metric spread across seeds. n_resample: K
averages K seeded draws. These tests check (a) the per-seed dataset draws
are deterministic and distinct, (b) the evaluator walks seeds 0..K-1 and
point-count-weights the rounds into one estimate, collapsing the spread.
"""

import numpy as np

from rpeflow_tpu.train.config import ConfigNode
from tests.test_end_to_end import _write_synthetic_ft3d


def _val_cfg(root, n_points=256):
    return ConfigNode({
        "name": "flyingthings3devent",
        "root_dir": root,
        "split": "val",
        "n_points": n_points,
        "event_bins": 2,
        "event_polarity": True,
        "augmentation": {"enabled": False},
    })


def test_per_seed_draws_deterministic_and_distinct(tmp_path):
    root = str(tmp_path / "data")
    _write_synthetic_ft3d(root, "val", 2, n_pts=400)
    from rpeflow_tpu.train.factory import dataset_factory

    ds = dataset_factory(_val_cfg(root))
    assert ds.resample_seed == 0

    item_a = ds[0]["pcs"].copy()
    ds.set_resample_seed(0)
    assert np.array_equal(ds[0]["pcs"], item_a)  # seed 0 == historical draw

    ds.set_resample_seed(1)
    item_b = ds[0]["pcs"].copy()
    assert not np.array_equal(item_b, item_a)    # a different draw
    item_b2 = ds[0]["pcs"].copy()
    assert np.array_equal(item_b, item_b2)       # but deterministic

    ds.set_resample_seed(0)
    assert np.array_equal(ds[0]["pcs"], item_a)  # and reversible


def test_concat_dataset_propagates_seed(tmp_path):
    root = str(tmp_path / "data")
    _write_synthetic_ft3d(root, "val", 2, n_pts=400)
    from rpeflow_tpu.data.dataset import ConcatDataset
    from rpeflow_tpu.train.factory import dataset_factory

    parts = [dataset_factory(_val_cfg(root)) for _ in range(2)]
    cat = ConcatDataset(parts)
    cat.set_resample_seed(3)
    assert all(p.resample_seed == 3 for p in parts)


class _FakeDataset:
    def __init__(self):
        self.seeds = []
        self.resample_seed = 0

    def set_resample_seed(self, s):
        self.seeds.append(s)
        self.resample_seed = s


def _stub_evaluator(n_resample, per_seed_epe):
    """Evaluator with run() wired to fakes: each 'round' contributes one
    batch whose EPE3d sum depends on the current resample seed."""
    from rpeflow_tpu.train.evaluator import Evaluator

    ev = object.__new__(Evaluator)
    ev.cfgs = ConfigNode({"testset": {"n_resample": n_resample}})
    ev.with_occ = False
    ev.dataset = _FakeDataset()
    counts = 100.0

    def fake_round(totals, times):
        epe = per_seed_epe[ev.dataset.resample_seed]
        for k, v in {
            "2d/counts": counts, "2d/EPE2d": 50.0, "2d/1px": 10.0,
            "2d/Fl": 5.0, "3d/counts": counts, "3d/EPE3d": epe * counts,
            "3d/5cm": 60.0, "3d/10cm": 80.0,
        }.items():
            totals[k] = totals.get(k, 0.0) + v
        times.append(0.01)

    ev._run_round = fake_round
    return ev


def test_resample_rounds_average_the_spread():
    per_seed = {0: 0.30, 1: 0.20, 2: 0.10}  # 3x spread across draws
    one = _stub_evaluator(1, per_seed).run()
    assert abs(one["EPE3d"] - 0.30) < 1e-9

    avg_ev = _stub_evaluator(3, per_seed)
    avg = avg_ev.run()
    assert avg_ev.dataset.seeds[:3] == [0, 1, 2]
    assert avg_ev.dataset.resample_seed == 0  # restored afterwards
    assert abs(avg["EPE3d"] - 0.20) < 1e-9    # count-weighted mean of draws
