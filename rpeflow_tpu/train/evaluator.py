"""Evaluation drivers.

TPU-native re-design of reference eval_withocc.py:18-135 and
eval_noocc.py:18-143: one jitted forward, per-forward device-synchronized
timing, and dataset-level point/pixel-count-weighted metric accumulation —
EPE/1px/Fl for 2D, EPE/5cm/10cm for 3D, plus the non-occluded 3D split when
``with_occ``. Per-sample metric sums are computed in-graph (one scalar per
metric crosses the device boundary, not the flow fields).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import get_mesh_for_batch, replicate, shard_batch
from .checkpoint import load_weights
from .config import ConfigNode
from .factory import dataset_factory, model_factory


def _metric_sums(outputs, batch, with_occ: bool):
    """In-graph metric accumulation for one batch (sums + counts)."""
    flow_2d_pred = outputs["flow_2d"].astype(jnp.float32)
    flow_3d_pred = outputs["flow_3d"].astype(jnp.float32)
    t2d = batch["flow_2d"].astype(jnp.float32)
    t3d = batch["flow_3d"].astype(jnp.float32)

    if t2d.shape[-1] > 2:
        mask2d = t2d[..., 2] > 0
        t2d = t2d[..., :2]
    else:
        mask2d = jnp.ones(t2d.shape[:3], bool)
    if t3d.shape[-1] > 3:
        mask3d = t3d[..., 3] > 0
        t3d = t3d[..., :3]
    else:
        mask3d = jnp.ones(t3d.shape[:2], bool)

    epe2d = jnp.linalg.norm(flow_2d_pred - t2d, axis=-1)
    epe3d = jnp.linalg.norm(flow_3d_pred - t3d, axis=-1)
    mask2d = mask2d & ~jnp.isnan(epe2d)
    mask3d = mask3d & ~jnp.isnan(epe3d)
    m2 = mask2d.astype(jnp.float32)
    m3 = mask3d.astype(jnp.float32)

    mag = jnp.linalg.norm(t2d, axis=-1)
    fl = ((epe2d > 3.0) & (epe2d / mag > 0.05)).astype(jnp.float32)

    out = {
        "2d/counts": jnp.sum(m2),
        "2d/EPE2d": jnp.sum(jnp.where(mask2d, epe2d, 0.0)),
        "2d/1px": jnp.sum((epe2d < 1.0) * m2),
        "2d/Fl": jnp.sum(fl * m2),
        "3d/counts": jnp.sum(m3),
        "3d/EPE3d": jnp.sum(jnp.where(mask3d, epe3d, 0.0)),
        "3d/5cm": jnp.sum((epe3d < 0.05) * m3),
        "3d/10cm": jnp.sum((epe3d < 0.1) * m3),
    }
    if with_occ:
        noc = (batch["occ_mask_3d"] == 0) & mask3d
        mn = noc.astype(jnp.float32)
        out.update({
            "3dnoc/counts": jnp.sum(mn),
            "3dnoc/EPE3d": jnp.sum(jnp.where(noc, epe3d, 0.0)),
            "3dnoc/5cm": jnp.sum((epe3d < 0.05) * mn),
            "3dnoc/10cm": jnp.sum((epe3d < 0.1) * mn),
        })
    return out


class Evaluator:
    """with_occ=True mirrors eval_withocc.py; False mirrors eval_noocc.py."""

    def __init__(self, cfgs: ConfigNode, with_occ: bool = True):
        self.cfgs = cfgs
        self.with_occ = with_occ

        logging.info("Loading test set from %s", cfgs.testset.root_dir)
        self.dataset = dataset_factory(cfgs.testset)
        from ..data.loader import DataLoader

        self.mesh = get_mesh_for_batch(cfgs.model.batch_size)
        self.loader = DataLoader(
            self.dataset, cfgs.model.batch_size, shuffle=False,
            num_workers=int(getattr(cfgs.testset, "n_workers", 2)),
            use_process_pool=getattr(cfgs.testset, "use_process_pool", None))

        logging.info("Creating model: %s", cfgs.model.name)
        self.model = model_factory(cfgs.model)

        init_batch = next(iter(self.loader))
        init_batch = {k: v for k, v in init_batch.items() if k != "index"}
        # init with the MI heads so the parameter tree matches training
        # checkpoints exactly (the reference's eval model also carries them;
        # they are loss-only and skipped during the eval forward)
        variables = jax.eval_shape(
            lambda b: self.model.init(
                {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
                b, train=True, compute_mi=True, compute_loss=True),
            init_batch)
        variables = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), variables)

        logging.info("Loading checkpoint from %s", cfgs.ckpt.path)
        strict = bool(getattr(cfgs.ckpt, "strict", True))
        self.variables = replicate(
            load_weights(cfgs.ckpt.path, variables, strict=strict), self.mesh)

        model = self.model
        with_occ_flag = self.with_occ

        from ..model.segmented import make_segmented_forward, segmented_enabled

        # YAML `model.segmented: true|false` overrides the RPEFLOW_SEGMENTED
        # env; unset defers to the env (default off)
        seg_cfg = getattr(cfgs.model, "segmented", None)
        use_segmented = segmented_enabled() if seg_cfg is None else bool(seg_cfg)
        if seg_cfg and not any(k.startswith(("RPEFLOW_PALLAS",
                                             "RPEFLOW_NO_PALLAS",
                                             "RPEFLOW_CONV1X1"))
                               for k in os.environ):
            # YAML opted into segmentation without pinning a kernel set:
            # default to the validated-fastest combination (the whole point
            # of segments is that these are healthy inside them — 148.8 ms
            # vs 192.8 with the quarantined defaults; PERF.md round 5).
            # Explicit env settings always win.
            os.environ["RPEFLOW_PALLAS_ALL"] = "1"
            os.environ["RPEFLOW_CONV1X1_EINSUM"] = "1"
        if use_segmented and np.prod(self.mesh.devices.shape) == 1:
            # RPEFLOW_SEGMENTED=1 (single-device eval): run the forward as
            # per-level jit segments so each compiled module stays below
            # the XLA:TPU tpu_custom_call miscompile scale — this is what
            # lets the quarantined Pallas kernels run healthy
            # (model/segmented.py; triage probe-seg-pallas-all). Metric
            # sums become their own small jit.
            seg_fwd = make_segmented_forward(model)
            metric_fn = jax.jit(
                lambda outputs, batch: _metric_sums(outputs, batch,
                                                    with_occ_flag))

            def forward(variables, batch):
                outputs = seg_fwd(variables, batch)
                return outputs, metric_fn(outputs, batch)

            self.forward = forward
        else:
            def forward(variables, batch):
                outputs, _ = model.apply(variables, batch, train=False,
                                         compute_mi=False, compute_loss=False)
                return outputs, _metric_sums(outputs, batch, with_occ_flag)

            from .state import jit_sharded

            self.forward = jit_sharded(forward, self.mesh, n_args=2,
                                       batch_argnum=1)

    def run(self) -> Dict[str, float]:
        logging.info("Running evaluation...")
        totals: Dict[str, float] = {}
        times = []
        # The reference evaluates every point of variable-size clouds
        # (eval_withocc.py:64-100); static TPU shapes force a fixed-n_points
        # resample, which carries an ~8-10% metric spread across draws.
        # ``testset.n_resample: K`` averages K seeded draws (point-count
        # weighted) to recover the reference's semantics in expectation.
        n_resample = int(getattr(self.cfgs.testset, "n_resample", 1) or 1)
        for rnd in range(n_resample):
            if n_resample > 1:
                self.dataset.set_resample_seed(rnd)
                logging.info("resample round %d/%d (seed %d)",
                             rnd + 1, n_resample, rnd)
            self._run_round(totals, times)
        if n_resample > 1:
            self.dataset.set_resample_seed(0)
        return self._report(totals, times)

    def _run_round(self, totals: Dict[str, float], times) -> None:
        for i, batch in enumerate(self.loader):
            batch = {k: v for k, v in batch.items()
                     if k not in ("index",) and
                     (self.with_occ or k != "occ_mask_3d")}
            sharded = shard_batch(batch, self.mesh)
            jax.block_until_ready(sharded)
            start = time.time()
            outputs, sums = self.forward(self.variables, sharded)
            # host readback of the metric scalars guarantees completion
            # (block_until_ready may be asynchronous on tunneled runtimes)
            sums = {k: float(v) for k, v in sums.items()}
            times.append(time.time() - start)
            # debug dump for pathological batches (reference eval_noocc.py:91-97)
            if sums["3d/counts"] and sums["3d/EPE3d"] / sums["3d/counts"] > 10.0:
                logging.warning(
                    "batch %d: mean EPE3D %.2f > 10 — inputs may be degenerate "
                    "(pcs range [%.2f, %.2f])", i,
                    sums["3d/EPE3d"] / sums["3d/counts"],
                    float(np.min(batch["pcs"])), float(np.max(batch["pcs"])))
            for k, v in sums.items():
                totals[k] = totals.get(k, 0.0) + v
            if (i + 1) % 20 == 0:
                # zero-count guard: a run of fully-masked batches must not
                # crash the progress log (final report has its own guard)
                c2d, c3d = totals["2d/counts"], totals["3d/counts"]
                logging.info("[%d/%d] EPE2D: %.6f, EPE3D: %.6f",
                             i + 1, len(self.loader),
                             totals["2d/EPE2d"] / c2d if c2d else float("nan"),
                             totals["3d/EPE3d"] / c3d if c3d else float("nan"))

    def _report(self, totals: Dict[str, float], times) -> Dict[str, float]:
        logging.info("#### Time ####")
        logging.info("Time: %.4f", float(np.mean(times[1:] if len(times) > 1 else times)))

        for key in ("2d/counts", "3d/counts", "3dnoc/counts"):
            if key in totals and totals[key] == 0.0:
                # every pixel/point was masked out or NaN — report NaN metrics
                # instead of crashing so the caller sees *which* block is
                # degenerate (all-NaN predictions usually mean a broken
                # checkpoint or miscompiled executable)
                logging.error("no valid elements for %s — metrics are NaN", key)
                totals[key] = float("nan")

        results = {}
        logging.info("#### 2D Metrics ####")
        results["EPE2d"] = totals["2d/EPE2d"] / totals["2d/counts"]
        results["1px"] = totals["2d/1px"] / totals["2d/counts"] * 100.0
        results["Fl"] = totals["2d/Fl"] / totals["2d/counts"] * 100.0
        logging.info("EPE: %.3f", results["EPE2d"])
        logging.info("1px: %.2f%%", results["1px"])
        logging.info("Fl:  %.2f%%", results["Fl"])

        logging.info("#### 3D Metrics ####")
        results["EPE3d"] = totals["3d/EPE3d"] / totals["3d/counts"]
        results["5cm"] = totals["3d/5cm"] / totals["3d/counts"] * 100.0
        results["10cm"] = totals["3d/10cm"] / totals["3d/counts"] * 100.0
        logging.info("EPE: %.3f", results["EPE3d"])
        logging.info("5cm: %.2f%%", results["5cm"])
        logging.info("10cm: %.2f%%", results["10cm"])

        if self.with_occ and "3dnoc/counts" in totals:
            logging.info("#### 3D Metrics (Non-occluded) ####")
            results["EPE3d_noc"] = totals["3dnoc/EPE3d"] / totals["3dnoc/counts"]
            results["5cm_noc"] = totals["3dnoc/5cm"] / totals["3dnoc/counts"] * 100.0
            results["10cm_noc"] = totals["3dnoc/10cm"] / totals["3dnoc/counts"] * 100.0
            logging.info("EPE: %.3f", results["EPE3d_noc"])
            logging.info("5cm: %.2f%%", results["5cm_noc"])
            logging.info("10cm: %.2f%%", results["10cm_noc"])

        results["mean_time"] = float(np.mean(times[1:] if len(times) > 1 else times))
        return results
