"""Probe: is the amp (pyramid-bf16) flagship forward finite on this toolchain?

Round-2 quarantined ``amp: true`` after the flagship-shape forward went NaN
in bf16 scopes — the bisect fingered XLA:TPU's grouped-conv lowering (a
depthwise conv emitting inf from |x| <= 5.5 inputs; PERF.md "bf16
decode-fuser experiment"). Round 3 replaced every grouped-conv emission
with the flat shift-multiply depthwise form by default
(rpeflow_tpu/nn/mdta.py:_dw_from_params), which cured the analogous
f32+Pallas-corr NaN. This probe re-tests the amp hypothesis on the current
graph: if the grouped-conv lowering was the trigger, amp should now be
finite.

Usage:
  python scripts/probe_amp.py                 # amp=True (pyramid bf16)
  python scripts/probe_amp.py --fuser-bf16    # + decode-fuser bf16 scope
  python scripts/probe_amp.py --train         # 12-step train trajectory

Prints one JSON line: {"mode", "finite", "ms_per_batch", ...}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fuser-bf16", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="run a 12-step train trajectory instead of eval fwd")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--b", type=int, default=4)
    args = ap.parse_args()

    if args.fuser_bf16:
        os.environ["RPEFLOW_FUSER_BF16"] = "1"

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    b, h, w, n = args.b, 576, 960, 8192
    model = RPEFlow(cfgs=_model_cfg(), amp=True)
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=b, h=h, w=w, n=n, bins=10,
                         with_targets=args.train)

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0),
                               "mi": jax.random.PRNGKey(1)}, bt,
                              train=args.train, compute_mi=args.train,
                              compute_loss=args.train)
    )(batch)
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    mode = ("train" if args.train else "eval") + (
        "+fuser_bf16" if args.fuser_bf16 else "")

    if args.train:
        from rpeflow_tpu.parallel import get_mesh, replicate, shard_batch
        from rpeflow_tpu.train.config import ConfigNode
        from rpeflow_tpu.train.optim import optimizer_factory
        from rpeflow_tpu.train.state import (create_train_state, jit_sharded,
                                             make_train_step)
        mesh = get_mesh(jax.devices()[:1])
        opt_cfg = ConfigNode({
            "max_epochs": 1, "optimizer": "adam",
            "lr": {"scheduler": "MultiStepLR", "init_value": 1e-4,
                   "decay_rate": 0.5, "decay_milestones": []},
            "weight_decay": 1e-6, "bias_decay": 0.0})
        tx, _ = optimizer_factory(opt_cfg, variables["params"],
                                  steps_per_epoch=10)
        state = replicate(create_train_state(variables, tx), mesh)
        step_fn = jit_sharded(make_train_step(model, tx), mesh, n_args=3)
        sb = shard_batch(batch, mesh)
        t0 = time.perf_counter()
        losses = []
        for i in range(args.steps):
            state, metrics = step_fn(state, sb, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
            if i == 0:
                print(f"compile+step0: {time.perf_counter() - t0:.1f}s "
                      f"loss={losses[0]:.4f}", file=sys.stderr)
                t0 = time.perf_counter()
        dt = (time.perf_counter() - t0) / max(args.steps - 1, 1)
        finite = bool(np.all(np.isfinite(losses)))
        print(json.dumps({"mode": mode, "finite": finite,
                          "ms_per_step": round(dt * 1000, 1),
                          "losses": [round(l, 4) for l in losses]}))
        return

    @jax.jit
    def forward(v, bt, eps):
        bt = dict(bt)
        bt["images"] = bt["images"] + eps
        outputs, _ = model.apply(v, bt, train=False, compute_mi=False,
                                 compute_loss=False)
        return outputs, jnp.sum(outputs["flow_2d"][0, 0, :8, 0]) * 1e-30

    batch = jax.device_put(batch)
    eps = jnp.float32(0.0)
    t0 = time.perf_counter()
    out, eps = forward(variables, batch, eps)
    np.asarray(jax.device_get(eps))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        out, eps = forward(variables, batch, eps + 1e-3 * (i + 1))
    f2d = np.asarray(jax.device_get(out["flow_2d"]))
    f3d = np.asarray(jax.device_get(out["flow_3d"]))
    dt = (time.perf_counter() - t0) / n_iters
    finite = bool(np.all(np.isfinite(f2d)) and np.all(np.isfinite(f3d)))
    print(json.dumps({"mode": mode, "finite": finite,
                      "ms_per_batch": round(dt * 1000, 2),
                      "fps": round(b / dt, 3)}))


if __name__ == "__main__":
    main()
