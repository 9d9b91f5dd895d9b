"""Flax model zoo: DBNet detector (ResNet backbones + FPN/FPEM_FFM necks +
DB head) and the text recognition model for the full OCR pipeline."""

from .dbnet import DBTextModel
from .resnet import (BACKBONES, BACKBONE_OUT_CHANNELS, resnet18, resnet34,
                     resnet50, resnet101, resnet152, deformable_resnet18,
                     deformable_resnet50)
from .fpn import FPN, FPEM_FFM, NECKS
from .head import DBHead, ConvHead, HEADS

__all__ = [
    "DBTextModel", "BACKBONES", "BACKBONE_OUT_CHANNELS", "resnet18",
    "resnet34", "resnet50", "resnet101", "resnet152", "deformable_resnet18",
    "deformable_resnet50", "FPN", "FPEM_FFM", "NECKS", "DBHead", "ConvHead",
    "HEADS",
]
