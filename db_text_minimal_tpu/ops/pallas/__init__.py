"""Pallas TPU kernels and on-device postprocess ops."""

from .db_step import fused_db_step
from .cc import connected_components, component_boxes

__all__ = ["fused_db_step", "connected_components", "component_boxes"]
