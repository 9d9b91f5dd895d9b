"""Data pipeline: dataset parsers, GT label generation, augmentation,
host-sharded loading, and a synthetic dataset generator."""

from .datasets import (BaseDataset, CTW1500Dataset, DataLoader, DATASETS,
                       ICDAR2015Dataset, MSRATD500Dataset, TotalTextDataset,
                       build_dataset)
from .labels import draw_thresh_map, make_gt_maps, shrink_polygon
from .parsers import PARSERS

__all__ = [
    "BaseDataset", "CTW1500Dataset", "DataLoader", "DATASETS",
    "ICDAR2015Dataset", "MSRATD500Dataset", "TotalTextDataset",
    "build_dataset", "draw_thresh_map", "make_gt_maps", "shrink_polygon",
    "PARSERS",
]
