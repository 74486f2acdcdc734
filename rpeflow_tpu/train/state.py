"""Train state and jitted step builders.

The TPU-native replacement for the reference's Trainer hot loop (reference
train.py:148-214): one jitted, sharded train step covering forward, loss,
backward, optimizer update and batch-norm stat update; one jitted eval step.
Under a data mesh, gradients/metrics/batch-stats are globally reduced by
XLA's partitioner (GSPMD) — no explicit collectives needed.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import make_batch_sharding


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables: Dict[str, Any], tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    compute_mi: bool = True,
) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, summary)."""

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            (outputs, aux), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, compute_mi=compute_mi, compute_loss=True,
                rngs={"mi": step_rng}, mutable=["batch_stats"],
            )
            return aux["loss"], (aux["scalar_summary"], mutated["batch_stats"])

        (loss, (summary, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        summary = dict(summary)
        summary["grad_norm"] = optax.global_norm(grads)
        return new_state, summary

    return train_step


def make_eval_step(model, compute_loss: bool = True) -> Callable:
    """Build the jitted eval step: (state, batch) -> (outputs, summary)."""

    def eval_step(state: TrainState, batch):
        outputs, aux = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch, train=False, compute_mi=False, compute_loss=compute_loss,
        )
        return outputs, aux.get("scalar_summary", {})

    return eval_step


def jit_sharded(fn: Callable, mesh: Optional[Mesh], n_args: int,
                batch_argnum: int = 1):
    """jit ``fn`` with the batch argument sharded over the mesh's data axis
    and everything else replicated. With mesh=None, plain jit.

    ``n_args`` is the number of positional arguments of ``fn``.
    """
    if mesh is None:
        return jax.jit(fn)
    repl = NamedSharding(mesh, P())
    data = make_batch_sharding(mesh)
    in_shardings = tuple(
        data if i == batch_argnum else repl for i in range(n_args))
    return jax.jit(fn, in_shardings=in_shardings, out_shardings=repl)
