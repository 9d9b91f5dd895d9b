"""Synthetic scene-text dataset generator (TotalText gt format).

No counterpart in the reference (it assumes the real datasets on disk); this
exists so the framework is testable and demo-able end-to-end without the
(large, licensed) originals: renders high-contrast text-like boxes on noisy
backgrounds and writes ``gt_img{id}.txt`` files in the TotalText CSV format
parsed by ``load_totaltext`` (``src/data_loaders.py:179-211``).
"""

from __future__ import annotations

import os

import numpy as np


def _curved_word_poly(rng, size, w, h):
    """CTW1500-style curved text polygon: 7 points along a bent baseline,
    7 back along the top (14 points total, matching the CTW parse shape)."""
    x = rng.randint(0, max(size - w - 1, 1))
    y = rng.randint(h + 10, max(size - h - 10, h + 11))
    bend = rng.uniform(-0.4, 0.4) * h * 3
    ts = np.linspace(0, 1, 7)
    base_x = x + ts * w
    base_y = y + bend * np.sin(ts * np.pi)
    top = np.stack([base_x, base_y - h], axis=1)
    bottom = np.stack([base_x[::-1], base_y[::-1]], axis=1)
    return np.concatenate([top, bottom], axis=0)


def _render_sample(rng: np.random.RandomState, size: int = 640,
                   max_words: int = 6, curved_prob: float = 0.0):
    import cv2

    img = np.full((size, size, 3), 0, np.uint8)
    # textured background
    img[:] = rng.randint(120, 200, size=(1, 1, 3), dtype=np.uint8)
    noise = rng.randint(0, 30, size=(size, size, 3), dtype=np.uint8)
    img = cv2.add(img, noise)

    polys = []
    n_words = rng.randint(1, max_words + 1)
    tries = 0
    while len(polys) < n_words and tries < 50:
        tries += 1
        w = rng.randint(max(size // 8, 24), max(size // 3, 48))
        h = rng.randint(max(size // 26, 12), max(size // 11, 24))
        if rng.rand() < curved_prob:
            box = np.clip(_curved_word_poly(rng, size, w, h), 2, size - 3)
        else:
            x = rng.randint(0, size - w - 1)
            y = rng.randint(0, size - h - 1)
            box = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]],
                           np.float64)
            angle = rng.uniform(-8, 8)
            center = box.mean(axis=0)
            rad = np.deg2rad(angle)
            rot = np.array([[np.cos(rad), -np.sin(rad)],
                            [np.sin(rad), np.cos(rad)]])
            box = np.clip((box - center) @ rot.T + center, 2, size - 3)
        # reject overlap with existing words (keeps labels unambiguous)
        if any(not (box[:, 0].max() < p[:, 0].min() - 8
                    or box[:, 0].min() > p[:, 0].max() + 8
                    or box[:, 1].max() < p[:, 1].min() - 8
                    or box[:, 1].min() > p[:, 1].max() + 8) for p in polys):
            continue
        # dark "text" region with light glyph-like strokes
        cv2.fillPoly(img, [box.astype(np.int32)], (25, 25, 30))
        n = len(box)
        n_strokes = max(w // 18, 2)
        for s in range(n_strokes):
            t = (s + 0.5) / n_strokes
            if n == 4:
                p0 = box[0] * (1 - t) + box[1] * t
                p1 = box[3] * (1 - t) + box[2] * t
            else:  # curved: interpolate along top and bottom chains
                k = t * (n // 2 - 1)
                i = int(k)
                f = k - i
                p0 = box[i] * (1 - f) + box[i + 1] * f
                jtop = n - 1 - i
                p1 = box[jtop] * (1 - f) + box[jtop - 1] * f
            p0 = p0 * 0.85 + p1 * 0.15
            p1 = p1 * 0.85 + p0 * 0.15
            cv2.line(img, tuple(p0.astype(int)), tuple(p1.astype(int)),
                     (230, 230, 235), 2)
        polys.append(box)
    return img, polys


def _render_glyph_sample(rng: np.random.RandomState, size: int = 640,
                         max_words: int = 6, charset: str = "0123456789"):
    """Sample with REAL rendered text (cv2 Hershey glyphs) so the
    recognition model can be trained end to end on synthetic data. Returns
    (image, [(poly, text), ...])."""
    import cv2

    img = np.full((size, size, 3),
                  rng.randint(140, 210, size=3, dtype=np.uint8), np.uint8)
    noise = rng.randint(0, 25, size=(size, size, 3), dtype=np.uint8)
    img = cv2.add(img, noise)
    words = []
    n_words = rng.randint(2, max_words + 1)
    tries = 0
    while len(words) < n_words and tries < 60:
        tries += 1
        text = "".join(rng.choice(list(charset))
                       for _ in range(rng.randint(3, 8)))
        font_scale = rng.uniform(1.2, 2.2)
        thickness = 2 + int(font_scale)
        (tw, th), baseline = cv2.getTextSize(
            text, cv2.FONT_HERSHEY_SIMPLEX, font_scale, thickness)
        if tw + 20 >= size or th + 20 >= size:
            continue
        x = rng.randint(6, size - tw - 8)
        y = rng.randint(th + 8, size - baseline - 8)
        box = np.array([[x - 4, y - th - 4], [x + tw + 4, y - th - 4],
                        [x + tw + 4, y + baseline + 4],
                        [x - 4, y + baseline + 4]], np.float64)
        if any(not (box[:, 0].max() < p[:, 0].min() - 8
                    or box[:, 0].min() > p[:, 0].max() + 8
                    or box[:, 1].max() < p[:, 1].min() - 8
                    or box[:, 1].min() > p[:, 1].max() + 8)
               for p, _ in words):
            continue
        cv2.putText(img, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, font_scale,
                    (20, 20, 25), thickness)
        words.append((box, text))
    return img, words


def generate_glyphs(out_dir: str, n_train: int = 16, n_test: int = 4,
                    size: int = 640, seed: int = 0,
                    charset: str = "0123456789") -> dict:
    """TotalText-format dataset whose words are real rendered glyph strings
    with true transcriptions in the label column — trains detector AND
    recognizer end to end."""
    import cv2

    rng = np.random.RandomState(seed)
    dirs = {
        "train_dir": os.path.join(out_dir, "train_images"),
        "test_dir": os.path.join(out_dir, "test_images"),
        "train_gt_dir": os.path.join(out_dir, "train_gts"),
        "test_gt_dir": os.path.join(out_dir, "test_gts"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def write_split(img_dir, gt_dir, count, offset):
        for i in range(count):
            img, words = _render_glyph_sample(rng, size=size,
                                              charset=charset)
            img_id = offset + i
            cv2.imwrite(os.path.join(img_dir, f"img{img_id}.jpg"), img)
            lines = []
            for poly, text in words:
                coords = ",".join(f"{v:.1f}" for v in poly.reshape(-1))
                lines.append(f"{coords},{text}")
            with open(os.path.join(gt_dir, f"gt_img{img_id}.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")

    write_split(dirs["train_dir"], dirs["train_gt_dir"], n_train, 0)
    write_split(dirs["test_dir"], dirs["test_gt_dir"], n_test, 1000)
    return {**dirs, "ignore_tags": ["###"]}


def export_word_crops(section: dict, out_dir: str, img_h: int = 32,
                      img_w: int = 100, jitter_copies: int = 4,
                      seed: int = 0) -> str:
    """Cut GT word crops (perspective-rectified) + labels.txt from a glyph
    dataset — training data for ``cli/train_rec``. Each word is exported
    ``jitter_copies`` times with random margin jitter so the recognizer is
    robust to the detector's unclip framing (detected boxes are dilated
    versions of the GT polygons)."""
    import cv2

    from ..ops import geometry as geo
    from .parsers import load_totaltext

    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    fps, anns = load_totaltext(section["train_dir"],
                               section["train_gt_dir"])
    dst = np.array([[0, 0], [img_w, 0], [img_w, img_h], [0, img_h]],
                   np.float64)
    lines = []
    count = 0
    for fp, ann in zip(fps, anns):
        img = cv2.imread(fp)[:, :, ::-1]
        for item in ann:
            poly = np.asarray(item["poly"], np.float64)
            if len(poly) != 4:
                continue
            center = poly.mean(axis=0)
            for copy in range(jitter_copies):
                if copy == 0:
                    box = poly
                else:
                    # random expansion (unclip-like) + corner jitter
                    grow = 1.0 + rng.uniform(0.0, 0.35)
                    box = (poly - center) * grow + center
                    box = box + rng.uniform(-3, 3, poly.shape)
                try:
                    matrix = geo.get_perspective_transform(box, dst)
                except ValueError:
                    continue
                warp = geo.warp_perspective(img, matrix, (img_w, img_h))
                fname = f"crop_{count}.jpg"
                cv2.imwrite(os.path.join(out_dir, fname), warp[:, :, ::-1])
                lines.append(f"{fname}\t{item['text']}")
                count += 1
    with open(os.path.join(out_dir, "labels.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_dir


def generate(out_dir: str, n_train: int = 8, n_test: int = 4,
             size: int = 640, seed: int = 0,
             curved_prob: float = 0.0) -> dict:
    """Write a TotalText-format dataset under ``out_dir``; ``curved_prob``
    mixes in CTW1500-style curved 14-point words. Returns the
    ``data.<name>`` config section pointing at it."""
    import cv2

    rng = np.random.RandomState(seed)
    dirs = {
        "train_dir": os.path.join(out_dir, "train_images"),
        "test_dir": os.path.join(out_dir, "test_images"),
        "train_gt_dir": os.path.join(out_dir, "train_gts"),
        "test_gt_dir": os.path.join(out_dir, "test_gts"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def write_split(img_dir, gt_dir, count, offset):
        for i in range(count):
            img, polys = _render_sample(rng, size=size,
                                        curved_prob=curved_prob)
            img_id = offset + i
            cv2.imwrite(os.path.join(img_dir, f"img{img_id}.jpg"), img)
            lines = []
            for p in polys:
                coords = ",".join(f"{v:.1f}" for v in p.reshape(-1))
                lines.append(f"{coords},word")
            with open(os.path.join(gt_dir, f"gt_img{img_id}.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")

    write_split(dirs["train_dir"], dirs["train_gt_dir"], n_train, 0)
    write_split(dirs["test_dir"], dirs["test_gt_dir"], n_test, 1000)
    return {**dirs, "ignore_tags": ["###"]}
