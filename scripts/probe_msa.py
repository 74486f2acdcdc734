"""Probe: is XLA:TPU memory-space-assignment (MSA) the all-on NaN trigger?

The optimized HLO of the all-on flagship forward shows Pallas custom-call
OPERANDS and RESULTS annotated with memory space S(1) (alternate memory /
VMEM) — e.g. ``%mdta_qkv_pallas.56 = (f32[4,1,4096,32]{...S(1)}, ...)``
(scripts/dump_custom_call_layouts.py). If MSA promotes a custom-call
buffer to VMEM while the Mosaic kernel DMAs it as an HBM buffer, the
kernel reads/writes the wrong memory — a context-dependent corruption that
would explain every observed signature (standalone clean, batch-size
dependence, three kernels guilty, fused-FPS innocent, toolchain-update
regression, barrier/grouped-conv dodges useless).

Runs the flagship forward all-Pallas-on with per-config compiler options
and reports finiteness. Usage:
    python scripts/probe_msa.py '{"xla_msa_enable": "false"}'
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    opts = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}

    import jax

    if os.environ.get("RPEFLOW_PROBE_PRECISION"):
        # "highest" forces the 6-pass f32 MXU emulation for convs/matmuls —
        # discriminates a miscompile in the default 3-pass bf16 emulation
        # (the round-2 "inf from |x| <= 5.5" conv signature).
        jax.config.update("jax_default_matmul_precision",
                          os.environ["RPEFLOW_PROBE_PRECISION"])

    # NOTE: no persistent cache — compiler_options change codegen and we
    # don't want to poison or be poisoned by cached default-flag builds.

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    b = int(os.environ.get("RPEFLOW_BISECT_B", 4))
    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=b, h=576, w=960, n=8192, bins=10)
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt)
    )(batch)

    def fwd(v, bt):
        outputs, _ = model.apply(v, bt, train=False, compute_mi=False,
                                 compute_loss=False)
        return outputs["flow_2d"], outputs["flow_3d"]

    t0 = time.perf_counter()
    compiled = jax.jit(fwd).lower(variables, batch).compile(
        compiler_options=opts or None)
    print(f"compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    f2d, f3d = compiled(variables, jax.device_put(batch))
    f2d = np.asarray(jax.device_get(f2d))
    f3d = np.asarray(jax.device_get(f3d))

    # quick throughput estimate (chained, 5 iters)
    t0 = time.perf_counter()
    for _ in range(5):
        f2d_d, f3d_d = compiled(variables, batch)
    np.asarray(jax.device_get(f2d_d[0, 0, :4, 0]))
    dt = (time.perf_counter() - t0) / 5

    bad2d = int(np.size(f2d) - np.sum(np.isfinite(f2d)))
    bad3d = int(np.size(f3d) - np.sum(np.isfinite(f3d)))
    print(json.dumps({
        "opts": opts,
        "finite": bad2d == 0 and bad3d == 0,
        "nonfinite_2d": bad2d, "nonfinite_3d": bad3d,
        "ms_per_batch_rough": round(dt * 1000, 1),
    }))


if __name__ == "__main__":
    main()
