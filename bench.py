"""Benchmark: inference throughput of the flagship RPEFlow model on one chip.

Measures frame-pairs/sec for the FlyingThings3D evaluation shape (batch 4,
576x960 RGB + 20-bin event voxel + 8192-point clouds — the exact shape
``eval_withocc.py conf/test/things.yaml`` feeds per step; reference
conf/test/things.yaml:15).

The reference publishes no throughput numbers (SURVEY.md §6); the RTX3090
baseline below is an estimate for the reference implementation on its eval
hardware (mean forward time ~0.5 s/batch of 4 -> ~8 frame-pairs/sec), used
only to normalize ``vs_baseline``. The north-star is >=5x that per chip.

Derivation (full detail in BASELINE.md "Derivation" section): XLA cost
analysis of this exact forward gives 7.8e11 FLOP / 1.36e11 fused-bytes per
batch; an unfused eager-torch executor materializes ~2.5-4x the fused bytes,
giving 5-8 fps on RTX3090's 936 GB/s, and the published ">8 days" pretrain
schedule bounds eval forward at <~17 fps. 8 fps is the optimistic end of the
unfused band; uncertainty is roughly +/-2x and ``vs_baseline`` inherits it.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

RTX3090_FRAME_PAIRS_PER_SEC_EST = 8.0


def main():
    import jax

    # TPU compile cache: the unrolled decode graph takes 5-18 min to compile
    # fresh; cached reruns load in seconds. (TPU executables serialize
    # portably, unlike the CPU AOT path that broke the test suite's cache.)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    b, h, w, n = 4, 576, 960, 8192
    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=b, h=h, w=w, n=n, bins=10)

    t0 = time.perf_counter()
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt)
    )(batch)
    jax.block_until_ready(variables)
    print(f"init+compile(init): {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    import jax.numpy as jnp

    @jax.jit
    def forward(v, bt, eps):
        # `eps` (a scalar carried from the previous iteration's output) is
        # added to the input so every timed iteration forms a serial
        # dependency chain the runtime cannot elide, overlap, or memoize.
        # The original `sum(flow) * 0.0` chain was CONSTANT-FOLDED by a newer
        # XLA (mul-by-zero simplification), which detached the chain from the
        # forward and let the loop measure enqueue time only (2.4 ms/batch,
        # a 58x-impossible reading). `* 1e-30` is numerically just as inert
        # on 255-scale image inputs but cannot legally fold.
        bt = dict(bt)
        bt["images"] = bt["images"] + eps
        outputs, _ = model.apply(v, bt, train=False, compute_mi=False,
                                 compute_loss=False)
        chain = jnp.sum(outputs["flow_2d"][0, 0, :8, 0]) * 1e-30
        return outputs, chain

    def sync(x):
        # block_until_ready can be a no-op under tunneled runtimes; a host
        # readback guarantees the dependency chain actually executed.
        return np.asarray(jax.device_get(x))

    batch = jax.device_put(batch)
    eps = jnp.float32(0.0)
    t0 = time.perf_counter()
    out, eps = forward(variables, batch, eps)
    sync(eps)
    print(f"compile(forward)+first step: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        # `eps + 1e-3*(i+1)` makes every iteration's inputs BIT-DISTINCT
        # (1e-3 is representable at 255-scale f32, flow-inert) so a
        # result-memoizing runtime layer can never serve a cached execution;
        # the driver's round-2 log recorded 2.4 ms/batch — iterations 2..10
        # had bit-identical (v, batch, eps=0.0) args.
        out, eps = forward(variables, batch, eps + 1e-3 * (i + 1))
    # Belt-and-braces: sync on a REAL output slice of the LAST iteration.
    # The runtime executes in-order (PERF.md honesty probe), so this forces
    # all 10 forwards even if the eps chain were ever folded again.
    last = sync(out["flow_2d"][0, 0, :4, 0])
    sync(eps)
    dt = (time.perf_counter() - t0) / n_iters

    if not np.all(np.isfinite(last)):
        print("FATAL: non-finite flow output — refusing to report throughput "
              "(garbage executable, e.g. poisoned compile cache)",
              file=sys.stderr)
        sys.exit(1)
    fps = b / dt
    print(f"forward: {dt * 1000:.1f} ms/batch of {b}", file=sys.stderr)
    if dt < 0.05:
        # Fastest conceivable full forward on one v5e is >>50 ms (measured
        # 138 ms at round 2; HBM-bandwidth bound). A faster reading means
        # the timing chain broke again — fail loudly rather than publish it.
        print(f"FATAL: {dt*1000:.1f} ms/batch is below the physical floor; "
              "timing dependency chain is broken", file=sys.stderr)
        sys.exit(1)
    print(json.dumps({
        "metric": "inference_throughput_ft3d_eval",
        "value": round(fps, 3),
        "unit": "frame_pairs_per_sec_per_chip",
        "vs_baseline": round(fps / RTX3090_FRAME_PAIRS_PER_SEC_EST, 3),
    }))


if __name__ == "__main__":
    main()
