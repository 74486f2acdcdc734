"""Optimizer + LR-schedule factory.

Mirrors reference factory.py:48-98 with optax:

  * Two decay groups selected by parameter name — torch puts every param with
    'weight' in its name (conv/linear/norm weights) in the ``weight_decay``
    group and every 'bias' in the ``bias_decay`` group. Parameters matching
    neither (only the MDTA ``temperature`` scalars) were passed to the torch
    optimizer in NO group and therefore never updated; we reproduce that
    faithfully with a frozen group.
  * Adam uses eps=1e-7 (reference factory.py:60).
  * Schedules: 'OneCycleLR' (per-iteration, torch defaults: 30% warmup,
    cosine anneal, div_factor 25, final_div_factor 1e4) or Step/MultiStepLR
    (per-epoch). Schedules are pure functions of the step counter, so
    resume fast-forwarding (reference factory.py:90-96) is just restoring
    the step.

Weight decay parity note: torch Adam's ``weight_decay`` adds ``wd * p`` to
the *gradient* before the Adam update (L2-regularization, not AdamW);
``optax.add_decayed_weights`` before ``scale_by_adam`` matches that order.
"""

from __future__ import annotations

import os as _os
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


def _group_of(path: Tuple[str, ...]) -> str:
    leaf = path[-1]
    # flax leaf names: kernel/scale/weight <- torch 'weight'; bias <- 'bias'.
    if leaf in ("kernel", "scale", "weight"):
        return "weights"
    if leaf == "bias":
        return "biases"
    return "frozen"  # e.g. MDTA 'temperature' (never optimized upstream)


def make_lr_schedule(cfgs, steps_per_epoch: int) -> Tuple[Callable[[int], float], str]:
    """Returns (schedule(step) -> lr, 'iter'|'epoch' granularity tag)."""
    lr0 = cfgs.lr.init_value
    if cfgs.lr.scheduler == "OneCycleLR":
        total = steps_per_epoch * cfgs.max_epochs
        sched = optax.cosine_onecycle_schedule(
            transition_steps=total, peak_value=lr0, pct_start=0.3,
            div_factor=25.0, final_div_factor=1e4)
        return sched, "iter"

    milestones = cfgs.lr.decay_milestones
    gamma = cfgs.lr.decay_rate
    if isinstance(milestones, int):
        def sched(step):
            epoch = step // steps_per_epoch
            return lr0 * (gamma ** (epoch // milestones))
    else:
        ms = jnp.asarray(list(milestones))

        def sched(step):
            epoch = step // steps_per_epoch
            n = jnp.sum(ms <= epoch)  # number of milestones reached
            return lr0 * (gamma ** n)
    return sched, "epoch"


class FusedAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    mu: jnp.ndarray     # flat first moment
    nu: jnp.ndarray     # flat second moment


def _fused_adam(
    params: Any, schedule: Callable[[int], float],
    weight_decay: float, bias_decay: float,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7,
) -> optax.GradientTransformation:
    """Flat fused Adam with per-group L2 decay and a frozen group.

    Elementwise-identical to ``multi_transform({group: chain(
    add_decayed_weights, scale_by_adam, scale_by_learning_rate)})`` — Adam is
    per-element, so running it on one raveled vector changes nothing — but
    replaces the ~40k tiny per-leaf HLO ops of the tree-mapped chain (73 ms
    +dispatch of the 682 ms train step, PERF.md) with a handful of fused
    full-vector ops. Group coefficients are looked up from a compact uint8
    segment-id constant instead of per-leaf masks.
    """
    from jax.flatten_util import ravel_pytree

    import numpy as np

    flat0, unravel = ravel_pytree(params)
    leaves_with_path = jax.tree_util.tree_flatten_with_path(params)[0]
    ids = np.concatenate([
        np.full(
            int(np.prod(leaf.shape)) if leaf.shape else 1,
            {"weights": 0, "biases": 1, "frozen": 2}[_group_of(tuple(
                p.key if hasattr(p, "key") else str(p) for p in path))],
            dtype=np.uint8)
        for path, leaf in leaves_with_path
    ])
    assert ids.shape == flat0.shape
    wd_table = jnp.asarray([weight_decay, bias_decay, 0.0], jnp.float32)
    keep_table = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)

    def init(params):
        flat, _ = ravel_pytree(params)
        z = jnp.zeros_like(flat)
        return FusedAdamState(jnp.zeros((), jnp.int32), z, z)

    def update(grads, state, params=None):
        assert params is not None, "fused adam needs params (weight decay)"
        g, _ = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        idv = jnp.asarray(ids)
        g = g + jnp.take(wd_table, idv) * p
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        count = state.count + 1
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        # scale_by_schedule semantics: first update uses schedule(0)
        lr = schedule(state.count)
        upd = (-lr) * (mu_hat / (jnp.sqrt(nu_hat) + eps))
        upd = upd * jnp.take(keep_table, idv)
        return unravel(upd), FusedAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def optimizer_factory(
    cfgs, params: Any, steps_per_epoch: int
) -> Tuple[optax.GradientTransformation, Callable[[int], float]]:
    """Build the optax transformation for the training config block.

    Args:
      cfgs: the ``training`` config block (optimizer/lr/weight_decay/...).
      params: the parameter tree (for group labeling).
      steps_per_epoch: length of the train loader (for per-epoch schedules).
    """
    schedule, _ = make_lr_schedule(cfgs, steps_per_epoch)

    if cfgs.optimizer == "adam" and not _os.environ.get("RPEFLOW_NO_FUSED_OPT"):
        tx = _fused_adam(params, schedule, float(cfgs.weight_decay),
                         float(getattr(cfgs, "bias_decay", 0.0)))
        return tx, schedule

    def base_opt(weight_decay: float) -> optax.GradientTransformation:
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        if cfgs.optimizer == "adam":
            chain.append(optax.scale_by_adam(eps=1e-7))
        elif cfgs.optimizer == "sgd":
            momentum = getattr(cfgs.lr, "momentum", 0.0)
            if momentum:
                chain.append(optax.trace(decay=momentum))
        else:
            raise NotImplementedError(f"Unknown optimizer: {cfgs.optimizer}")
        chain.append(optax.scale_by_learning_rate(schedule))
        return optax.chain(*chain)

    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _group_of(tuple(
            p.key if hasattr(p, "key") else str(p) for p in path)),
        params,
    )
    tx = optax.multi_transform(
        {
            "weights": base_opt(cfgs.weight_decay),
            "biases": base_opt(getattr(cfgs, "bias_decay", 0.0)),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    return tx, schedule
