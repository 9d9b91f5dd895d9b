"""Compute ops: Pallas TPU kernels (``ops.pallas``) and the first-party C++
host geometry library (``ops.geometry``)."""
