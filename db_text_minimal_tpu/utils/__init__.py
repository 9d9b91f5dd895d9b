"""Shared utilities: determinism, logging, timing, image preprocessing and
visualization. TPU-native counterpart of the reference ``src/utils.py``.

Preprocessing parity notes (SURVEY.md §2a #8, #18):
- Caffe means ``[103.939, 116.779, 123.68]`` are subtracted from images in
  **RGB channel order** exactly as the reference does (``src/utils.py:184-199``,
  ``src/data_loaders.py:30,151-154`` — BGR means applied to RGB data); this
  quirk is preserved for checkpoint parity.
- Layout is NHWC (TPU-native) instead of the reference's NCHW; conversion
  happens only at the torch-checkpoint import boundary.
"""

from __future__ import annotations

import functools
import logging
import os
import random
import time

import numpy as np

CAFFE_MEAN = (103.939, 116.779, 123.68)  # src/data_loaders.py:30


def setup_determinism(seed: int = 42) -> np.random.RandomState:
    """Seed all host RNGs (reference ``src/utils.py:22-33``). JAX device-side
    randomness is handled functionally via PRNG keys derived from this seed;
    XLA itself is deterministic for a fixed program."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return np.random.RandomState(seed)


def setup_logger(logger_name: str = "dbtext-tpu",
                 log_file_path: str | None = None) -> logging.Logger:
    """Mirror of ``src/utils.py:36-48`` plus a console handler (the reference
    relied on hydra's root handler for console output)."""
    logger = logging.getLogger(logger_name)
    formatter = logging.Formatter(
        "%(asctime)s %(name)s %(levelname)s: %(message)s")
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        stream = logging.StreamHandler()
        stream.setFormatter(formatter)
        logger.addHandler(stream)
    if log_file_path is not None and not any(
            isinstance(h, logging.FileHandler) for h in logger.handlers):
        file_handle = logging.FileHandler(log_file_path)
        file_handle.setFormatter(formatter)
        logger.addHandler(file_handle)
    logger.setLevel(logging.DEBUG)
    return logger


def timer(func):
    """Wall-clock decorator (``src/utils.py:51-60``)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        end = time.time()
        print(">>> Function {}: {}'s".format(func.__name__, end - start))
        return result

    return wrapper


def str_to_bool(value: str) -> bool:
    """``src/utils.py:102-107``."""
    if value.lower() in {"false", "f", "0", "no", "n"}:
        return False
    if value.lower() in {"true", "t", "1", "yes", "y"}:
        return True
    raise ValueError("{} is not a valid boolean value".format(value))


def minmax_scaler_img(img: np.ndarray) -> np.ndarray:
    """``src/utils.py:110-113``."""
    img = np.asarray(img)
    rng = img.max() - img.min()
    if rng == 0:
        return np.zeros_like(img, dtype="uint8")
    return ((img - img.min()) * (1 / rng * 255)).astype("uint8")


def test_resize(img: np.ndarray, size: int = 640, pad: bool = False) -> np.ndarray:
    """Aspect-preserving resize so both sides ≤ ``size``; optional pad to a
    square canvas (``src/utils.py:160-175``)."""
    import cv2

    h, w, c = img.shape
    scale = min(size / w, size / h)
    h = int(h * scale)
    w = int(w * scale)
    if pad:
        new_img = np.zeros((size, size, c), img.dtype)
        new_img[:h, :w] = cv2.resize(img, (w, h))
        return new_img
    return cv2.resize(img, (w, h))


def read_img(img_fp: str):
    """BGR file → RGB array + original size (``src/utils.py:178-181``)."""
    import cv2

    img = cv2.imread(img_fp)
    if img is None:
        raise FileNotFoundError(img_fp)
    img = img[:, :, ::-1]
    h_origin, w_origin, _ = img.shape
    return img, h_origin, w_origin


def test_preprocess(img: np.ndarray,
                    mean=CAFFE_MEAN,
                    pad: bool = False,
                    size: int = 640) -> np.ndarray:
    """Inference preprocessing (``src/utils.py:184-199``): aspect resize to
    ≤``size``, mean-subtract (RGB order — parity quirk), add batch dim.
    Returns float32 NHWC (the reference returns NCHW torch tensors)."""
    img = test_resize(img, size=size, pad=pad)
    img = img.astype(np.float32)
    img = img - np.asarray(mean, dtype=np.float32)
    return np.expand_dims(img, axis=0)


def pad_to_multiple(img: np.ndarray, multiple: int = 32):
    """Pad NHWC/HWC image so H and W are multiples of ``multiple`` (XLA wants
    static, conv-stride-compatible shapes; the reference model implicitly
    requires /32-divisible inputs through its stride-32 backbone)."""
    h, w = img.shape[-3:-1]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph == 0 and pw == 0:
        return img, (h, w)
    pad_width = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return np.pad(img, pad_width), (h, w)


def draw_bbox(img, result, color=(255, 0, 0), thickness=3):
    """Draw closed polylines over an RGB image (``src/utils.py:202-212``)."""
    import cv2

    if isinstance(img, str):
        img = cv2.imread(img)
    img = np.ascontiguousarray(np.asarray(img).copy())
    for point in result:
        point = np.asarray(point).astype(int)
        cv2.polylines(img, [point], True, color, thickness)
    return img
