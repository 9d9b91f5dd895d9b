"""Ground-truth annotation parsers for the four supported datasets.

Format-exact rebuilds of the reference's dataset iterators
(``src/data_loaders.py``):
- TotalText (:175-211): ``gt_img{id}.txt``, CSV of x,y floats + trailing
  label; polygons with < 3 points dropped.
- CTW1500 (:214-253): ``{id}.txt``, 32 ints per line: x,y,w,h then 28 offsets
  relative to (x, y) forming a 14-point polygon (PSENet-style parse).
- ICDAR2015 (:256-289): ``gt_{id}.txt``, 8 int coords + transcript (which may
  itself contain commas); ignore tag ``###``.
- MSRA-TD500 (:292-347): ``{id}.gt`` rotated rects ``idx dif x y w h θ`` →
  4 corners via rotation about the rect center; difficult (dif=1) skipped.

Each parser returns ``(image_paths, annotations)`` where annotations is a
list (per image) of ``{"poly": [[x, y], ...], "text": str}`` dicts.
"""

from __future__ import annotations

import glob
import math
import os

import numpy as np


def _read_lines(path: str) -> list[str]:
    with open(path, "r", encoding="utf-8", errors="ignore") as f:
        return f.readlines()


def _strip_bom(s: str) -> str:
    return s.strip("﻿").strip("\xef\xbb\xbf")


def load_totaltext(img_dir: str, gt_dir: str):
    """``src/data_loaders.py:179-211``."""
    img_fps = sorted(glob.glob(os.path.join(img_dir, "*")))
    gt_fps = []
    for img_fp in img_fps:
        img_id = img_fp.split("/")[-1].replace("img", "").split(".")[0]
        gt_fps.append(os.path.join(gt_dir, "gt_img{}.txt".format(img_id)))
    anns = []
    for gt_fp in gt_fps:
        lines = []
        for line in _read_lines(gt_fp):
            parts = line.strip().split(",")
            label = parts[-1]
            cleaned = [_strip_bom(i) for i in parts]
            num_points = math.floor((len(cleaned) - 1) / 2) * 2
            poly = np.array(list(map(float, cleaned[:num_points]))).reshape(
                (-1, 2)).tolist()
            if len(poly) < 3:
                continue
            lines.append({"poly": poly, "text": label})
        anns.append(lines)
    return img_fps, anns


def load_ctw1500(img_dir: str, gt_dir: str):
    """``src/data_loaders.py:218-253``."""
    img_fps = sorted(glob.glob(os.path.join(img_dir, "*")))
    gt_fps = [os.path.join(gt_dir, "{}.txt".format(fp.split("/")[-1][:-4]))
              for fp in img_fps]
    anns = []
    for gt_fp in gt_fps:
        lines = []
        for line in _read_lines(gt_fp):
            gt = _strip_bom(line.strip())
            if not gt:
                continue
            vals = list(map(int, gt.split(",")))
            x1, y1 = vals[0], vals[1]
            bbox = np.asarray(vals[4:32]) + np.array([x1, y1] * 14)
            lines.append({"poly": bbox.reshape(-1, 2).tolist(),
                          "text": "True"})
        anns.append(lines)
    return img_fps, anns


def load_icdar2015(img_dir: str, gt_dir: str):
    """``src/data_loaders.py:260-289`` (note: the reference does NOT sort
    image paths here; we sort for determinism across hosts)."""
    img_fps = sorted(glob.glob(os.path.join(img_dir, "*")))
    gt_fps = [os.path.join(gt_dir,
                           "gt_{}.txt".format(fp.split("/")[-1].split(".")[0]))
              for fp in img_fps]
    anns = []
    for gt_fp in gt_fps:
        lines = []
        for line in _read_lines(gt_fp):
            gt = _strip_bom(line.strip()).split(",")
            if len(gt) < 9:
                continue
            label = ",".join(gt[8:])
            poly = np.asarray(list(map(int, gt[:8]))).reshape(-1, 2).tolist()
            lines.append({"poly": poly, "text": label})
        anns.append(lines)
    return img_fps, anns


def _rotate_points(points, center, theta):
    """``src/data_loaders.py:296-313`` (note the reference negates θ and
    int-truncates the rotated corners)."""
    theta = -theta
    x_c, y_c = center
    out = []
    for x, y in points:
        x_new = x_c + (x - x_c) * np.cos(theta) + (y - y_c) * np.sin(theta)
        y_new = y_c - (x - x_c) * np.sin(theta) + (y - y_c) * np.cos(theta)
        out.append((int(x_new), int(y_new)))
    return out


def load_msra_td500(img_dir: str, gt_dir: str | None = None):
    """``src/data_loaders.py:315-347`` (gt files live next to the images)."""
    img_fps = sorted(glob.glob(os.path.join(img_dir, "*.JPG")))
    gt_fps = sorted(glob.glob(os.path.join(img_dir, "*.gt")))
    anns = []
    for gt_fp in gt_fps:
        lines = []
        for line in _read_lines(gt_fp):
            vals = list(map(float, line.strip().split()))
            if len(vals) < 7:
                continue
            _, dif, x_min, y_min, w, h, theta = vals[:7]
            if int(dif) == 1:  # difficult label
                continue
            corners = [(x_min, y_min), (x_min + w, y_min),
                       (x_min + w, y_min + h), (x_min, y_min + h)]
            center = (x_min + w / 2, y_min + h / 2)
            rot_box = _rotate_points(corners, center, theta)
            lines.append({"poly": np.array(rot_box).tolist(), "text": "True"})
        anns.append(lines)
    return img_fps, anns


PARSERS = {
    "totaltext": load_totaltext,
    "ctw1500": load_ctw1500,
    "icdar2015": load_icdar2015,
    "msra_td500": load_msra_td500,
}
