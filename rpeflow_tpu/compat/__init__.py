"""Torch-checkpoint compatibility: convert reference RPEFlow state_dicts to
rpeflow_tpu variable trees."""

from .torch_loader import convert_state_dict, load_torch_checkpoint

__all__ = ["convert_state_dict", "load_torch_checkpoint"]
