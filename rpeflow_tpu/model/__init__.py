"""Model assembly: the RPEFlow joint 2D/3D flow estimator."""

from .core import RPEFlowCore
from .rpeflow import DEFAULT_N_SAMPLES, RPEFlow, flow_metrics, is_better

__all__ = ["DEFAULT_N_SAMPLES", "RPEFlow", "RPEFlowCore", "flow_metrics", "is_better"]
