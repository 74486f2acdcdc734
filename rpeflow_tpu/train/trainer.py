"""Training driver.

TPU-native re-design of the reference Trainer (reference train.py:48-242):
one process drives all local devices through a 1-D data mesh — there is no
mp.spawn, no process group, no DDP wrapper, no GradScaler (bf16 on TPU needs
no loss scaling). The epoch loop, per-step logging, validation with
dataset-weighted metric aggregation, best-checkpoint tracking and
epoch-granular resume all mirror the reference semantics.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..model.rpeflow import is_better
from ..parallel.mesh import get_mesh, replicate, shard_batch
from .checkpoint import CheckpointManager, load_weights
from .config import ConfigNode
from .factory import dataset_factory, model_factory
from .optim import make_lr_schedule, optimizer_factory
from .state import create_train_state, jit_sharded, make_eval_step, make_train_step


def init_logging(log_file: Optional[str] = None):
    handlers = [logging.StreamHandler()]
    if log_file:
        os.makedirs(os.path.dirname(log_file), exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )


def log_string(summary: Dict[str, float], with_mi: bool = True) -> str:
    """Per-step log line (reference RPEFlow.py:171-183)."""
    parts = [
        "loss: %.1f" % summary["loss"],
        "epe2d: %.3f" % summary["epe2d"],
        "epe3d: %.3f" % summary["epe3d"],
        "loss_2d: %.3f" % summary["loss_2d"],
        "loss_3d: %.3f" % summary["loss_3d"],
    ]
    if with_mi and "mi_loss" in summary:
        parts.append("mi: %.3f" % summary["mi_loss"])
    return ", ".join(parts)


class Trainer:
    def __init__(self, cfgs: ConfigNode):
        from ..parallel.mesh import maybe_initialize_distributed

        # multi-host (DCN): auto-initializes from the pod environment or the
        # JAX_COORDINATOR_ADDRESS family; no-op on a single host
        multihost = maybe_initialize_distributed()
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        is_main = self.process_index == 0

        self.cfgs = cfgs
        self.curr_epoch = 1
        self.best_metrics = None

        log_dir = cfgs.log.dir
        os.makedirs(log_dir, exist_ok=True)
        if is_main:
            init_logging(os.path.join(log_dir, "train.log"))
        else:
            # non-main ranks stay silent (reference train.py:76-77)
            logging.getLogger().handlers = []
            logging.getLogger().addHandler(logging.NullHandler())

        if is_main:
            try:
                from tensorboardX import SummaryWriter

                self.summary_writer = SummaryWriter(log_dir)
            except ImportError:
                self.summary_writer = None
        else:
            self.summary_writer = None
        if multihost:
            logging.info("Multi-host: %d processes, %d global devices",
                         self.process_count, len(jax.devices()))

        batch_size = cfgs.model.batch_size
        devices = jax.devices()
        n_devices = len(devices)
        if batch_size % n_devices != 0:
            n_use = max(k for k in range(1, n_devices + 1) if batch_size % k == 0)
            logging.warning(
                "global batch size %d does not divide over %d devices; "
                "using the first %d", batch_size, n_devices, n_use)
            devices = devices[:n_use]
        self.mesh = get_mesh(devices)
        logging.info("Device mesh: %d device(s): %s", len(devices), devices[:4])

        from ..data.loader import DataLoader

        trainset_cfg = cfgs.trainset if "trainset" in cfgs else cfgs.trainset1
        logging.info("Loading training set from %s", trainset_cfg.root_dir)
        self.train_dataset = dataset_factory(
            cfgs if "trainset1" in cfgs else cfgs.trainset)
        self.train_loader = DataLoader(
            self.train_dataset, batch_size, shuffle=True,
            drop_last=bool(getattr(trainset_cfg, "drop_last", False)),
            num_workers=int(getattr(trainset_cfg, "n_workers", 2)),
            use_process_pool=getattr(trainset_cfg, "use_process_pool", None),
            shard_index=self.process_index, num_shards=self.process_count)

        logging.info("Loading validation set from %s", cfgs.valset.root_dir)
        self.val_dataset = dataset_factory(cfgs.valset)
        self.val_loader = DataLoader(
            self.val_dataset, batch_size, shuffle=False,
            num_workers=int(getattr(cfgs.valset, "n_workers", 2)),
            use_process_pool=getattr(cfgs.valset, "use_process_pool", None),
            shard_index=self.process_index, num_shards=self.process_count)

        logging.info("Creating model: %s", cfgs.model.name)
        amp = bool(getattr(cfgs, "amp", False))
        if amp:
            # Working again as of round 4: the round-2 bf16 NaN trigger
            # (XLA:TPU's grouped-conv lowering) is no longer emitted by the
            # default graph, and the 2026-08-20 flagship-shape probes are
            # finite for both the eval forward and a 12-step train
            # trajectory (triage/probe_amp_{eval,train}.log). Note the
            # measured cost on the current toolchain: bf16 conv-layout
            # relayouts make the amp EVAL forward ~4.4x slower and the
            # train step ~6% slower than f32 — amp is a capability parity
            # flag (reference train.py:127,155), not a speed win on TPU;
            # convs/matmuls already execute on the bf16 MXU in the f32
            # graph.
            logging.warning(
                "amp: true — pyramid activations run in bfloat16. On the "
                "current XLA:TPU toolchain this measures SLOWER than f32 "
                "(see triage/probe_amp_eval.log); use for parity, not speed.")
        self.model = model_factory(cfgs.model, amp=amp)

        # init with the first batch's shapes
        init_batch = next(iter(self.val_loader if len(self.val_dataset) else
                               self.train_loader))
        variables = jax.jit(
            lambda b: self.model.init(
                {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)},
                b, train=True, compute_mi=True, compute_loss=True)
        )(init_batch)
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree_util.tree_leaves(variables["params"]))
        logging.info("Trainable parameters: %d", n_params)

        if cfgs.ckpt.path and not cfgs.ckpt.resume:
            logging.info("Transferring weights from %s (non-strict)", cfgs.ckpt.path)
            variables = load_weights(cfgs.ckpt.path, variables, strict=False)

        self.steps_per_epoch = len(self.train_loader)
        self.tx, self.lr_schedule = optimizer_factory(
            cfgs.training, variables["params"], self.steps_per_epoch)
        _, self.lr_granularity = make_lr_schedule(cfgs.training, self.steps_per_epoch)

        self.state = create_train_state(variables, self.tx)
        self.ckpt_manager = CheckpointManager(log_dir)

        if cfgs.ckpt.path and cfgs.ckpt.resume:
            logging.info("Resuming from %s", cfgs.ckpt.path)
            self.state, meta = self.ckpt_manager.restore(cfgs.ckpt.path, self.state)
            self.curr_epoch = meta["last_epoch"] + 1
            self.best_metrics = meta["best_metrics"]

        self.state = replicate(self.state, self.mesh)
        # `training.segmented: true` (or RPEFLOW_SEGMENTED_TRAIN=1) runs the
        # step as per-segment fwd/bwd jits (train/segmented_step.py) — the
        # healthy-kernel training path. Single-device only: the segments
        # are plain jits, so multi-device meshes keep the GSPMD monolith.
        seg_cfg = getattr(cfgs.training, "segmented", None)
        import numpy as _np
        import os as _os
        use_seg_train = (bool(seg_cfg) if seg_cfg is not None else
                         _os.environ.get("RPEFLOW_SEGMENTED_TRAIN", "")
                         .strip().lower() not in ("", "0", "false", "no",
                                                  "off"))
        if use_seg_train and int(_np.prod(self.mesh.devices.shape)) == 1:
            from .segmented_step import make_segmented_train_step

            logging.info("Using the segmented train step (per-level jits)")
            self.train_step = make_segmented_train_step(self.model, self.tx)
        else:
            if use_seg_train:
                logging.info("segmented train step requested but the mesh "
                             "has %d devices — keeping the GSPMD monolith",
                             int(_np.prod(self.mesh.devices.shape)))
            self.train_step = jit_sharded(
                make_train_step(self.model, self.tx), self.mesh, n_args=3)
        self.eval_step = jit_sharded(
            make_eval_step(self.model, compute_loss=True), self.mesh, n_args=2)
        self.rng = jax.random.PRNGKey(int(getattr(cfgs, "seed", 0)))

    # ------------------------------------------------------------------
    def run(self):
        while self.curr_epoch <= self.cfgs.training.max_epochs:
            self.train_loader.set_epoch(self.curr_epoch)
            self.train_one_epoch()
            if len(self.val_dataset):
                val_summary = self.validate()
                if is_better(val_summary, self.best_metrics):
                    self.best_metrics = val_summary
                    logging.info("New best: outlier2d=%.4f",
                                 val_summary["outlier2d"])
                    if self.cfgs.log.save_ckpt:
                        self.save_ckpt("best")
            if (self.cfgs.log.save_ckpt and self.curr_epoch %
                    self.cfgs.log.save_ckpt_every_n_epochs == 0):
                self.save_ckpt("epoch-%03d" % self.curr_epoch)
            self.curr_epoch += 1

    def train_one_epoch(self):
        logging.info("Epoch %d: training...", self.curr_epoch)
        # Optional profiler trace: set log.profile_steps: [start, stop] to
        # capture a TensorBoard trace of those steps (viewable with
        # tensorboard --logdir <log.dir>/profile). The reference had no
        # profiler at all (SURVEY.md §5).
        profile_steps = getattr(self.cfgs.log, "profile_steps", None)
        t_end = time.time()
        for i, batch in enumerate(self.train_loader):
            if profile_steps and i == int(profile_steps[0]):
                jax.profiler.start_trace(
                    os.path.join(self.cfgs.log.dir, "profile"))
            if profile_steps and i == int(profile_steps[1]):
                jax.profiler.stop_trace()
            t_data = time.time() - t_end
            batch = {k: v for k, v in batch.items() if k != "index"}
            sharded = shard_batch(batch, self.mesh)
            self.state, summary = self.train_step(self.state, sharded, self.rng)
            summary = {k: float(v) for k, v in summary.items()}
            step = int(self.state.step)
            t_total = time.time() - t_end
            t_end = time.time()

            lr = float(self.lr_schedule(step))
            logging.info(
                "E%d S%d [%d/%d] %s, lr: %.2e, time: %.2fs (data %.2fs)",
                self.curr_epoch, step, i + 1, len(self.train_loader),
                log_string(summary), lr, t_total, t_data)
            if self.summary_writer is not None:
                for k, v in summary.items():
                    self.summary_writer.add_scalar(f"train/{k}", v, step)
                self.summary_writer.add_scalar("train/lr", lr, step)

    def validate(self) -> Dict[str, float]:
        logging.info("Epoch %d: validating...", self.curr_epoch)
        sums: Dict[str, float] = {}
        n_total = 0
        for bi, batch in enumerate(self.val_loader):
            bs = batch["images"].shape[0]
            batch = {k: v for k, v in batch.items() if k != "index"}
            outputs, summary = self.eval_step(self.state,
                                              shard_batch(batch, self.mesh))
            if (bi == 0 and self.summary_writer is not None
                    and self.process_count == 1):
                # (multi-host: flow_2d shards live on other hosts; skip the
                # image readback rather than fetching cross-host)
                # image summary: predicted-flow rendering of the first sample
                # (the reference plumbs image summaries but never fills them,
                # RPEFlow.py:18,168-169)
                from ..utils.visualization import flow_to_image

                img = flow_to_image(np.asarray(outputs["flow_2d"][0]))
                self.summary_writer.add_image(
                    "val/flow_2d_pred", img, int(self.state.step),
                    dataformats="HWC")
            for k, v in summary.items():
                sums[k] = sums.get(k, 0.0) + float(v) * bs
            n_total += bs
        avg = {k: v / n_total for k, v in sums.items()}
        logging.info("Validation: %s", log_string(avg, with_mi=False))
        if self.summary_writer is not None:
            for k, v in avg.items():
                self.summary_writer.add_scalar(f"val/{k}", v, int(self.state.step))
        return avg

    def save_ckpt(self, name: str):
        self.ckpt_manager.save(name, self.state, self.curr_epoch,
                               self.best_metrics)
