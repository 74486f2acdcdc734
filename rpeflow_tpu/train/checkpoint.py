"""Checkpoint save/load (orbax) with the reference's schema semantics.

The reference stores ``{last_epoch, last_step, state_dict, best_metrics}``
(reference train.py:227-232) and supports non-strict loading for
pretrain->fine-tune transfer (train.py:234-242). Here:

  * native checkpoints are orbax directories holding the full TrainState
    (params, batch_stats, opt_state, step) plus a JSON metadata sidecar;
  * reference ``.pt`` files load through compat.torch_loader, with
    non-strict (shape-matched) merging for transfer.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=()):
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def merge_params(
    target: Dict, source: Dict, strict: bool = False
) -> Tuple[Dict, list]:
    """Copy source leaves into target where paths+shapes match.

    Non-strict merging mirrors ``load_state_dict(strict=False)``
    (reference train.py:242). Returns (merged, skipped_paths).
    """
    src = {path: v for path, v in _flatten(source)}
    skipped = []

    def rebuild(node, prefix=()):
        if isinstance(node, Mapping):
            return {k: rebuild(v, prefix + (k,)) for k, v in node.items()}
        if prefix in src and tuple(src[prefix].shape) == tuple(node.shape):
            return np.asarray(src[prefix], dtype=np.asarray(node).dtype)
        skipped.append("/".join(prefix))
        return node

    merged = rebuild(target)
    if strict:
        missing = [p for p in skipped]
        extra = [p for p in src if not _path_in(target, p)]
        if missing or extra:
            raise ValueError(
                f"strict load failed; unmatched target paths: {missing[:5]}..., "
                f"unmatched checkpoint paths: {extra[:5]}...")
    return merged, skipped


def _path_in(tree, path):
    node = tree
    for k in path:
        if not isinstance(node, Mapping) or k not in node:
            return False
        node = node[k]
    return True


class CheckpointManager:
    """Epoch-granular checkpointing (reference train.py:143-144, 212-232)."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def save(self, name: str, state, last_epoch: int, best_metrics: Optional[dict]):
        import orbax.checkpoint as ocp

        path = self._path(name)
        ckptr = ocp.StandardCheckpointer()
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        meta = {
            "last_epoch": int(last_epoch),
            "last_step": int(state.step),
            "best_metrics": _jsonable(best_metrics),
        }
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
        logging.info("saved checkpoint %s (epoch %d)", path, last_epoch)

    def restore(self, name_or_path: str, state):
        """Restore a full TrainState (resume). Returns (state, meta)."""
        import orbax.checkpoint as ocp

        path = name_or_path if os.path.isabs(name_or_path) \
            else self._path(name_or_path)
        ckptr = ocp.StandardCheckpointer()
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = ckptr.restore(path, template)
        meta = {"last_epoch": -1, "last_step": -1, "best_metrics": None}
        if os.path.isfile(path + ".meta.json"):
            meta = json.load(open(path + ".meta.json"))
        new_state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"], step=restored["step"],
        ) if hasattr(state, "replace") else state
        return new_state, meta


def load_weights(path: str, variables: Dict[str, Any], strict: bool = False):
    """Load model weights (not optimizer state) from an orbax dir or a
    reference ``.pt`` checkpoint. Returns updated variables."""
    if path.endswith(".pt") or path.endswith(".pth"):
        from ..compat.torch_loader import load_torch_checkpoint

        converted = load_torch_checkpoint(path)["variables"]
    else:
        import orbax.checkpoint as ocp

        # structure-free restore: checkpoints carry the full TrainState
        # (params/batch_stats/opt_state/step); we only consume the model
        # variables here, so let orbax infer the on-disk tree.
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        converted = restored if "params" in restored else {"params": restored}

    params, skipped = merge_params(variables["params"],
                                   converted.get("params", {}), strict=strict)
    out = dict(variables)
    out["params"] = params
    if "batch_stats" in variables and converted.get("batch_stats"):
        bs, _ = merge_params(variables["batch_stats"], converted["batch_stats"],
                             strict=False)
        out["batch_stats"] = bs
    if skipped:
        logging.info("load_weights: %d parameters not found in checkpoint "
                     "(non-strict transfer)", len(skipped))
    return out


def _jsonable(x):
    if x is None:
        return None
    return jax.tree_util.tree_map(
        lambda v: float(v) if hasattr(v, "item") or isinstance(v, (int, float))
        else v, dict(x))
