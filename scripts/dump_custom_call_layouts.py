"""Dump post-layout-assignment operand/result layouts of every Pallas
custom call in the flagship eval forward.

Discriminator for the round-3 all-on NaN: Mosaic kernels read their operand
buffers assuming DEFAULT (descending minor-to-major) layouts. If the
XLA:TPU layout assigner propagates a non-default layout (e.g. the
batch-minor activation layouts it picks around the level-1 convs — PERF.md
"3,579 anonymous relayouts") into a `tpu_custom_call` operand instead of
inserting a copy, the kernel reads permuted bytes: garbage output in
context only, at batch >= 2 only (batch-minor is degenerate at b=1), for
exactly the kernels fed by conv activations — the observed signature.

Usage: python scripts/dump_custom_call_layouts.py [--b 4] [--h 576] ...
Prints every custom-call line from the optimized HLO (layouts appear in
the {…} suffix of each shape).
"""

import argparse
import re
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=576)
    ap.add_argument("--w", type=int, default=960)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--dump-all", action="store_true",
                    help="write the full optimized HLO to /tmp/flagship_hlo.txt")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _model_cfg, _synth_batch
    from rpeflow_tpu.model import RPEFlow

    model = RPEFlow(cfgs=_model_cfg())
    rng = np.random.RandomState(0)
    batch = _synth_batch(rng, b=args.b, h=args.h, w=args.w, n=args.n, bins=10)
    variables = jax.jit(
        lambda bt: model.init({"params": jax.random.PRNGKey(0)}, bt)
    )(batch)

    def fwd(v, bt):
        outputs, _ = model.apply(v, bt, train=False, compute_mi=False,
                                 compute_loss=False)
        return outputs["flow_2d"], outputs["flow_3d"]

    lowered = jax.jit(fwd).lower(variables, batch)
    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.dump_all:
        with open("/tmp/flagship_hlo.txt", "w") as f:
            f.write(txt)
        print("full HLO -> /tmp/flagship_hlo.txt", file=sys.stderr)

    # Custom calls + the defs of their operands (to see operand layouts).
    lines = txt.splitlines()
    defs = {}
    for ln in lines:
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = ", ln)
        if m:
            defs[m.group(1)] = ln.strip()
    n_cc = 0
    for ln in lines:
        if "custom-call" not in ln or "tpu_custom_call" not in ln:
            continue
        n_cc += 1
        print("CC :", ln.strip()[:500])
        for arg in re.findall(r"%([\w.\-]+)", ln.split("custom-call", 1)[1])[:8]:
            if arg in defs:
                print("  in:", defs[arg][:300])
        print()
    print(f"total tpu_custom_call sites: {n_cc}")


if __name__ == "__main__":
    main()
