"""Data pipeline tests: parser formats (tiny synthetic gt files per format,
SURVEY.md §4 plan (a)), GT map generation, thresh-map parity with the
reference formula, loader sharding, and the synthetic dataset end to end."""

import os
import sys

import numpy as np
import pytest

from db_text_minimal_tpu.data import parsers, make_gt_maps, DataLoader
from db_text_minimal_tpu.data.labels import draw_thresh_map, shrink_polygon
from db_text_minimal_tpu.data.synthetic import generate
from db_text_minimal_tpu.data.datasets import TotalTextDataset

REFERENCE = "/root/reference/src"


# --------------------------------------------------------------------------
# parsers
# --------------------------------------------------------------------------

def _write(path, text):
    with open(path, "w") as f:
        f.write(text)


def test_totaltext_parser(tmp_path):
    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gts"
    img_dir.mkdir()
    gt_dir.mkdir()
    (img_dir / "img12.jpg").touch()
    _write(gt_dir / "gt_img12.txt",
           "10,20,110,20,110,60,10,60,hello\n1,1,2,2,#\n")
    fps, anns = parsers.load_totaltext(str(img_dir), str(gt_dir))
    assert len(fps) == 1
    assert len(anns[0]) == 1  # 2-point line dropped (< 3 points)
    assert anns[0][0]["text"] == "hello"
    assert anns[0][0]["poly"] == [[10, 20], [110, 20], [110, 60], [10, 60]]


def test_ctw1500_parser(tmp_path):
    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gts"
    img_dir.mkdir()
    gt_dir.mkdir()
    (img_dir / "0001.jpg").touch()
    offsets = ",".join(str(v) for v in range(28))
    _write(gt_dir / "0001.txt", f"100,200,50,30,{offsets}\n")
    fps, anns = parsers.load_ctw1500(str(img_dir), str(gt_dir))
    poly = np.array(anns[0][0]["poly"])
    assert poly.shape == (14, 2)
    # offsets are relative to (x1, y1) = (100, 200)
    assert poly[0].tolist() == [100, 201]
    assert poly[1].tolist() == [102, 203]


def test_icdar2015_parser(tmp_path):
    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gts"
    img_dir.mkdir()
    gt_dir.mkdir()
    (img_dir / "im_1.png").touch()
    _write(gt_dir / "gt_im_1.txt",
           "0,0,10,0,10,10,0,10,word,with,commas\n5,5,9,5,9,9,5,9,###\n")
    fps, anns = parsers.load_icdar2015(str(img_dir), str(gt_dir))
    assert anns[0][0]["text"] == "word,with,commas"
    assert anns[0][1]["text"] == "###"
    assert np.array(anns[0][0]["poly"]).shape == (4, 2)


def test_msra_td500_parser(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    (img_dir / "IMG_001.JPG").touch()
    # idx dif x y w h theta ; second line difficult -> skipped
    _write(img_dir / "IMG_001.gt",
           "0 0 100 50 80 40 0.0\n1 1 10 10 20 20 0.5\n")
    fps, anns = parsers.load_msra_td500(str(img_dir))
    assert len(anns[0]) == 1
    poly = np.array(anns[0][0]["poly"])
    assert poly.shape == (4, 2)
    np.testing.assert_array_equal(
        poly, [[100, 50], [180, 50], [180, 90], [100, 90]])  # θ=0 no rotation


def test_msra_rotation():
    # 90° rotation of a wide rect about its center swaps extents
    fps = parsers._rotate_points(
        [(0, 0), (40, 0), (40, 20), (0, 20)], (20, 10), np.pi / 2)
    arr = np.array(fps)
    assert arr[:, 0].max() - arr[:, 0].min() == pytest.approx(20, abs=1)
    assert arr[:, 1].max() - arr[:, 1].min() == pytest.approx(40, abs=1)


def test_cocotext_parser(tmp_path):
    import json

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    (img_dir / "COCO_train_001.jpg").touch()
    gt = {
        "imgs": {"1": {"file_name": "COCO_train_001.jpg"},
                 "2": {"file_name": "missing.jpg"}},
        "imgToAnns": {"1": [10, 11, 12]},
        "anns": {
            "10": {"image_id": 1, "utf8_string": "word",
                   "legibility": "legible",
                   "mask": [0, 0, 30, 0, 30, 10, 0, 10]},
            "11": {"image_id": 1, "utf8_string": "blur",
                   "legibility": "illegible",
                   "mask": [5, 5, 15, 5, 15, 9, 5, 9]},
            "12": {"image_id": 1, "utf8_string": "xx",
                   "legibility": "legible", "mask": [1, 1, 2, 2]},
        },
    }
    (tmp_path / "cocotext.v2.json").write_text(json.dumps(gt))
    fps, anns = parsers.load_cocotext(str(img_dir), str(tmp_path))
    assert len(fps) == 1  # missing.jpg skipped
    assert len(anns[0]) == 2  # 2-point mask dropped
    assert anns[0][0]["text"] == "word"
    assert anns[0][0]["poly"] == [[0, 0], [30, 0], [30, 10], [0, 10]]
    assert anns[0][1]["text"] == "###"  # illegible -> ignore tag


def test_synthtext_parser(tmp_path):
    from scipy.io import savemat

    img_dir = tmp_path / "root"
    (img_dir / "8").mkdir(parents=True)
    (img_dir / "8" / "ballet_3.jpg").touch()
    # image 0: two words (2, 4, 2); image 1 (missing on disk): skipped
    wordbb0 = np.stack([
        np.array([[0, 30, 30, 0], [0, 0, 10, 10]], np.float64),
        np.array([[40, 70, 70, 40], [0, 0, 10, 10]], np.float64),
    ], axis=2)
    def _cells(items):
        arr = np.empty((1, len(items)), dtype=object)
        for i, it in enumerate(items):
            arr[0, i] = it
        return arr

    mat = {
        "imnames": _cells([np.array(["8/ballet_3.jpg"]),
                           np.array(["gone.jpg"])]),
        "wordBB": _cells([wordbb0, wordbb0[:, :, 0]]),
        "txt": _cells([np.array(["hello\n world"]), np.array(["x"])]),
    }
    savemat(tmp_path / "gt.mat", mat)
    fps, anns = parsers.load_synthtext(str(img_dir), str(tmp_path))
    assert len(fps) == 1
    assert len(anns[0]) == 2
    assert anns[0][0]["text"] == "hello"
    assert anns[0][1]["text"] == "world"
    assert anns[0][0]["poly"] == [[0, 0], [30, 0], [30, 10], [0, 10]]


def test_art2019_parser(tmp_path):
    import json

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    (img_dir / "gt_7.jpg").touch()
    gt = {"gt_7": [
        {"points": [[0, 0], [20, 0], [25, 8], [10, 12], [0, 10]],
         "transcription": "curved", "illegibility": False},
        {"points": [[1, 1], [2, 2]], "transcription": "tiny",
         "illegibility": False},
        {"points": [[5, 5], [9, 5], [9, 9]], "transcription": "??",
         "illegibility": True},
    ]}
    (tmp_path / "train_labels.json").write_text(json.dumps(gt))
    fps, anns = parsers.load_art2019(str(img_dir), str(tmp_path))
    assert len(fps) == 1
    assert len(anns[0]) == 2  # 2-point entry dropped
    assert anns[0][0]["text"] == "curved"
    assert len(anns[0][0]["poly"]) == 5  # arbitrary vertex count kept
    assert anns[0][1]["text"] == "###"  # illegible -> ignore


# --------------------------------------------------------------------------
# label generation
# --------------------------------------------------------------------------

def test_make_gt_maps_basic():
    anns = [{"poly": [[100, 100], [300, 100], [300, 180], [100, 180]],
             "text": "word"},
            {"poly": [[10, 10], [14, 10], [14, 14], [10, 14]],
             "text": "tiny"},           # < min_text_size -> ignored
            {"poly": [[400, 400], [500, 400], [500, 450], [400, 450]],
             "text": "###"}]            # ignore tag
    gt, mask, thresh, tmask, flags = make_gt_maps(anns, 640, ["###"])
    assert flags == [False, True, True]
    assert gt.shape == (640, 640)
    # shrunk region strictly inside the polygon
    assert gt[140, 200] == 1.0
    assert gt[101, 101] == 0.0
    # ignored polys zero the supervision mask
    assert mask[12, 12] == 0.0
    assert mask[420, 450] == 0.0
    assert mask[140, 200] == 1.0
    # thresh map peaks near the polygon border, in [0.3, 0.7]
    assert thresh.min() == pytest.approx(0.3, abs=1e-6)
    assert thresh.max() <= 0.7 + 1e-6
    assert thresh[100, 200] > 0.65        # on the border
    # text area mask covers dilated polygon band
    assert tmask[100, 200] == 1.0
    assert tmask[12, 12] == 0.0           # ignored -> no thresh supervision


def test_shrink_polygon_eq6():
    poly = np.array([[0, 0], [200, 0], [200, 80], [0, 80]], float)
    shr = shrink_polygon(poly, 0.4)
    assert shr is not None
    d = (200 * 80) * (1 - 0.16) / 560
    width = shr[:, 0].max() - shr[:, 0].min()
    assert width == pytest.approx(200 - 2 * d, abs=2)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_draw_thresh_map_matches_reference_formula():
    """Full draw_thresh_map vs a numpy reimplementation of the reference
    using OUR offset for the dilation (isolates the distance-field and
    canvas-fusion math; the offset itself is covered by geometry tests)."""
    from db_text_minimal_tpu.ops import geometry as geo

    poly = [[50, 40], [150, 45], [148, 90], [52, 88]]
    canvas = np.zeros((200, 200), np.float32)
    mask = np.zeros((200, 200), np.float32)
    draw_thresh_map(poly, canvas, mask, shrink_ratio=0.4)

    polygon = np.array(poly, float)
    area, length = geo.polygon_area(polygon), geo.polygon_perimeter(polygon)
    distance = area * (1 - 0.4 ** 2) / length
    padded = np.asarray(geo.offset_polygon(polygon, distance)[0], float)
    xmin, xmax = int(padded[:, 0].min()), int(padded[:, 0].max())
    ymin, ymax = int(padded[:, 1].min()), int(padded[:, 1].max())
    h, w = ymax - ymin + 1, xmax - xmin + 1
    shifted = polygon - [xmin, ymin]
    xs = np.broadcast_to(np.arange(w, dtype=float)[None, :], (h, w))
    ys = np.broadcast_to(np.arange(h, dtype=float)[:, None], (h, w))

    def compute_distance(p1, p2):
        sq1 = (xs - p1[0]) ** 2 + (ys - p1[1]) ** 2
        sq2 = (xs - p2[0]) ** 2 + (ys - p2[1]) ** 2
        sq = (p1[0] - p2[0]) ** 2 + (p1[1] - p2[1]) ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            cosin = (sq - sq1 - sq2) / (2 * np.sqrt(sq1 * sq2))
            ssin = np.nan_to_num(1 - cosin ** 2)
            res = np.sqrt(sq1 * sq2 * ssin / sq)
        res[cosin < 0] = np.sqrt(np.fmin(sq1, sq2))[cosin < 0]
        return res

    dm = np.min([np.clip(compute_distance(shifted[i],
                                          shifted[(i + 1) % 4]) / distance,
                         0, 1) for i in range(4)], axis=0)
    expected = np.zeros((200, 200), np.float32)
    expected[ymin:ymax + 1, xmin:xmax + 1] = 1 - dm
    np.testing.assert_allclose(canvas, np.fmax(expected, 0), atol=1e-5)
    assert mask[ymin + h // 2, xmin + w // 2] == 1.0


# --------------------------------------------------------------------------
# loader + synthetic end to end
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    generate(str(d), n_train=6, n_test=2, seed=0)
    return str(d)


def test_synthetic_dataset_end_to_end(synth_dir):
    ds = TotalTextDataset(os.path.join(synth_dir, "train_images"),
                          os.path.join(synth_dir, "train_gts"),
                          ignore_tags=["###"], is_training=True)
    assert len(ds) == 6
    sample = ds[0]
    assert sample["img"].shape == (640, 640, 3)
    assert sample["img"].dtype == np.float32
    assert sample["prob_map"].shape == (640, 640)
    assert sample["prob_map"].max() == 1.0         # at least one valid word
    assert 0.3 - 1e-6 <= sample["thresh_map"].min()
    assert sample["thresh_map"].max() <= 0.7 + 1e-6


def test_eval_mode_carries_anns(synth_dir):
    ds = TotalTextDataset(os.path.join(synth_dir, "test_images"),
                          os.path.join(synth_dir, "test_gts"),
                          ignore_tags=["###"], is_training=False)
    sample = ds[0]
    assert "anns" in sample and "ignore_tags" in sample
    assert len(sample["anns"]) == len(sample["ignore_tags"])


def test_loader_sharding_and_batching(synth_dir):
    ds = TotalTextDataset(os.path.join(synth_dir, "train_images"),
                          os.path.join(synth_dir, "train_gts"),
                          ignore_tags=["###"], is_training=True)
    shards = []
    for host in range(2):
        loader = DataLoader(ds, batch_size=1, shuffle=True, seed=7,
                            num_hosts=2, host_id=host, prefetch=0)
        shards.append([b["image_path"][0] for b in loader])
    # disjoint coverage of the epoch permutation
    assert not (set(shards[0]) & set(shards[1]))
    assert len(shards[0]) + len(shards[1]) == 6

    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=7)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["img"].shape == (2, 640, 640, 3)
    assert batches[0]["prob_map"].shape == (2, 640, 640)


def test_loader_parallel_workers_deterministic(synth_dir):
    """Thread-pool sample loading must not change batch contents vs serial
    loading (per-(epoch, index) aug RNGs)."""
    def run(num_workers):
        ds = TotalTextDataset(os.path.join(synth_dir, "train_images"),
                              os.path.join(synth_dir, "train_gts"),
                              ignore_tags=["###"], is_training=True)
        loader = DataLoader(ds, batch_size=2, shuffle=True, seed=11,
                            prefetch=0, num_workers=num_workers)
        return [b["img"].sum() for b in loader]

    serial = run(1)
    parallel = run(4)
    assert len(serial) == len(parallel)
    np.testing.assert_allclose(serial, parallel)


def test_synthetic_curved_words(tmp_path):
    """Curved (14-point) words flow through parsing, validity filtering,
    and GT map generation."""
    section = generate(str(tmp_path), n_train=3, n_test=1, size=256, seed=2,
                       curved_prob=1.0)
    ds = TotalTextDataset(section["train_dir"], section["train_gt_dir"],
                          ["###"], is_training=False, image_size=256)
    found_curved = False
    for i in range(len(ds)):
        sample = ds[i]
        for poly in sample["anns"]:
            if len(poly) > 4:
                found_curved = True
        assert sample["prob_map"].shape == (256, 256)
    assert found_curved


def test_compact_dtypes_pipeline_equivalence(synth_dir):
    """Compact-dtype batches + device_preprocess reproduce the float32
    pipeline exactly (thresh map within float16 resolution)."""
    import jax.numpy as jnp

    from db_text_minimal_tpu.train.trainer import device_preprocess

    kw = dict(ignore_tags=["###"], is_training=False)
    ds_f32 = TotalTextDataset(os.path.join(synth_dir, "train_images"),
                              os.path.join(synth_dir, "train_gts"), **kw)
    ds_u8 = TotalTextDataset(os.path.join(synth_dir, "train_images"),
                             os.path.join(synth_dir, "train_gts"),
                             compact_dtypes=True, **kw)
    a, b = ds_f32[0], ds_u8[0]
    assert b["img"].dtype == np.uint8
    assert b["prob_map"].dtype == np.uint8
    # binary maps ship bit-packed: 8 pixels per byte along the width
    assert b["prob_map"].shape[-1] * 8 == a["prob_map"].shape[-1]
    assert b["supervision_mask"].shape == b["prob_map"].shape
    assert b["thresh_map"].dtype == np.float16
    dec = device_preprocess({k: jnp.asarray(v[None]) for k, v in b.items()
                             if k != "image_path" and k != "anns"
                             and k != "ignore_tags"})
    np.testing.assert_allclose(np.asarray(dec["img"][0]), a["img"],
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dec["prob_map"][0]),
                                  a["prob_map"])
    np.testing.assert_allclose(np.asarray(dec["thresh_map"][0]),
                               a["thresh_map"], atol=2e-3)


def test_generate_hard_ctw_roundtrip(tmp_path):
    """CTW1500-format line-level generator (VERDICT r2 missing #1): the
    emitted gt files parse through the CTW1500 parser
    (``src/data_loaders.py:218-253`` format) into 14-point line polygons
    that cover the rendered ink."""
    from db_text_minimal_tpu.data.parsers import load_ctw1500
    from db_text_minimal_tpu.data.synthetic import generate_hard_ctw

    section = generate_hard_ctw(str(tmp_path), n_train=2, n_test=2,
                                size=320, seed=3)
    fps, anns = load_ctw1500(section["test_dir"], section["test_gt_dir"])
    assert len(fps) == 2
    total = 0
    for ann in anns:
        for item in ann:
            poly = np.asarray(item["poly"])
            assert poly.shape == (14, 2)
            assert item["text"] == "True"   # CTW has no ignore convention
            total += 1
    assert total >= 2
    # deterministic in seed
    import cv2

    section2 = generate_hard_ctw(str(tmp_path / "again"), n_train=2,
                                 n_test=2, size=320, seed=3)
    a = cv2.imread(fps[0])
    b = cv2.imread(sorted(
        __import__("glob").glob(section2["test_dir"] + "/*"))[0])
    assert np.array_equal(a, b)
