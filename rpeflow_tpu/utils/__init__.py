"""Misc utilities: visualization, profiling helpers."""

from .visualization import flow_to_image, scene_flow_to_image, event_voxel_to_image

__all__ = ["event_voxel_to_image", "flow_to_image", "scene_flow_to_image"]
