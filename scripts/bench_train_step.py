"""Time the full training step (fwd + loss + bwd + adam) on one TPU chip.

    python scripts/bench_train_step.py [--batch 4]

Set RPEFLOW_NO_REMAT=1 to measure without fusion-block rematerialization.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--amp", action="store_true",
                    help="bf16 activations (flax dtype=bfloat16)")
    ap.add_argument("--segmented", action="store_true",
                    help="per-segment fwd/bwd jits (train/segmented_step.py)"
                         " — the healthy-kernel training path")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow
    from rpeflow_tpu.train.config import ConfigNode
    from rpeflow_tpu.train.optim import optimizer_factory
    from rpeflow_tpu.train.segmented_step import make_segmented_train_step
    from rpeflow_tpu.train.state import create_train_state, make_train_step

    rng = np.random.RandomState(0)
    model = RPEFlow(cfgs=_model_cfg(),
                    dtype=jnp.bfloat16 if args.amp else None)
    batch = jax.device_put(_synth_batch(
        rng, b=args.batch, h=576, w=960, n=8192, bins=10, with_targets=True))

    variables = jax.jit(lambda bt: model.init(
        {"params": jax.random.PRNGKey(0), "mi": jax.random.PRNGKey(1)}, bt,
        train=True, compute_mi=True, compute_loss=True))(batch)
    tcfg = ConfigNode({
        "max_epochs": 10, "optimizer": "adam",
        "lr": {"scheduler": "MultiStepLR", "init_value": 4e-4,
               "decay_rate": 0.5, "decay_milestones": [4]},
        "weight_decay": 1e-6, "bias_decay": 0.0})
    tx, _ = optimizer_factory(tcfg, variables["params"], 100)
    state = create_train_state(variables, tx)
    step = (make_segmented_train_step(model, tx) if args.segmented
            else jax.jit(make_train_step(model, tx)))

    def sync(st):
        # readiness is per-buffer: sync on an updated *parameter* (produced
        # at the end of the dataflow), not the loss scalar
        np.asarray(st.params["pwc_fusion_core"]["conv_last_2d"]["kernel"]).ravel()[0]

    t0 = time.perf_counter()
    state, summary = step(state, batch, jax.random.PRNGKey(0))
    sync(state)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"(remat={'off' if os.environ.get('RPEFLOW_NO_REMAT') else 'on'})",
          file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, summary = step(state, batch, jax.random.PRNGKey(i))
    sync(state)
    dt = (time.perf_counter() - t0) / args.iters
    loss = float(summary["loss"])
    import math
    print(f"train step: {dt * 1000:.1f} ms/step "
          f"({args.batch / dt:.2f} samples/s/chip), loss={loss:.2f}, "
          f"finite={math.isfinite(loss)}")


if __name__ == "__main__":
    main()
