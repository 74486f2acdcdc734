"""Probe which XLA:TPU compiler options the current toolchain accepts.

Compiling a trivial jitted function with ``compiler_options={flag: value}``
fails fast with "Unknown flag" / INVALID_ARGUMENT when the option does not
exist, and succeeds (cheaply) when it does — so candidate mitigation flags
for a miscompile investigation can be screened in seconds each before
paying a 10-min flagship compile per flag (scripts/probe_msa.py).

Usage:
    python scripts/probe_flags.py                      # screen the builtin list
    python scripts/probe_flags.py xla_foo=true ...     # screen specific flags
"""

import sys

# Candidates for disabling/limiting memory-space-assignment (MSA) promotion
# of Pallas custom-call operands/results to alternate memory (S(1)) — the
# round-3 in-context NaN suspect (see scripts/probe_msa.py docstring).
CANDIDATES = [
    ("xla_tpu_alternate_memory_benefit_scaling_factor", "0"),
    ("xla_tpu_enable_alternate_memory", "false"),
    ("xla_tpu_memory_space_assignment_enabled", "false"),
    ("xla_tpu_enable_memory_space_assignment", "false"),
    ("xla_tpu_msa_enabled", "false"),
    ("xla_tpu_async_copy_bandwidth_scaling_factor", "1"),
    ("xla_tpu_prefer_async_allocations_over_sync", "false"),
    ("xla_tpu_memory_bound_loop_optimizer_options", "enabled:false"),
    ("xla_tpu_scoped_vmem_limit_kib", "16384"),
    ("xla_tpu_use_repeated_instance_for_preferred_prefetch_time", "false"),
    ("xla_tpu_enable_dot_strength_reduction", "false"),
    ("xla_jf_conv_full_precision", "true"),
    ("xla_tpu_layout_use_alias_scope", "false"),
    ("xla_tpu_use_bundle_aware_cost_model_for_fusions", "false"),
]


def main():
    import jax
    import jax.numpy as jnp

    args = sys.argv[1:]
    cands = ([tuple(a.split("=", 1)) for a in args] if args else CANDIDATES)

    lowered = jax.jit(lambda x: x * 2.0 + 1.0).lower(jnp.ones((8, 128)))
    # warm baseline (also verifies the device works at all)
    lowered.compile()

    for flag, value in cands:
        try:
            lowered.compile(compiler_options={flag: value})
            print(f"ACCEPTED  {flag}={value}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"rejected  {flag}={value}  ({msg})", flush=True)


if __name__ == "__main__":
    main()
