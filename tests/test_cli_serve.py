"""End-to-end CLI + serving tests: train → checkpoint → test CLI
(heatmap/poly/rect) → make_eval with GT export → ioueval/deteval CLIs →
REST server round trip — the full reference Makefile surface
(SURVEY.md §1 L6–L8) on the synthetic dataset."""

import json
import os
import pickle
import threading
import urllib.request

import numpy as np
import pytest

from db_text_minimal_tpu.config import load_config
from db_text_minimal_tpu.data import DataLoader, TotalTextDataset
from db_text_minimal_tpu.data.synthetic import generate
from db_text_minimal_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One-epoch training on a tiny synthetic dataset; returns paths."""
    root = tmp_path_factory.mktemp("e2e")
    section = generate(str(root / "data"), n_train=3, n_test=2, size=128,
                       seed=3)
    cfg = load_config(overrides={
        "meta": {"root_dir": str(root)},
        "hps": {"img_size": 128, "batch_size": 1, "test_batch_size": 1,
                "no_epochs": 1, "log_iter": 10},
        "data": {"synthetic": section},
        "dataset": {"name": "synthetic"},
        "logging": {"logger_file": None},
    })
    train_loader = DataLoader(
        TotalTextDataset(section["train_dir"], section["train_gt_dir"],
                         ["###"], is_training=True, image_size=128),
        1, shuffle=True, prefetch=0)
    test_loader = DataLoader(
        TotalTextDataset(section["test_dir"], section["test_gt_dir"],
                         ["###"], is_training=False, image_size=128),
        1, prefetch=0)
    trainer = Trainer(cfg, train_loader, test_loader)
    trainer.fit(no_epochs=1)
    ckpt = str(root / "models" / "last_cp.ckpt")
    assert os.path.exists(ckpt)
    sample_img = os.path.join(section["test_dir"], sorted(
        os.listdir(section["test_dir"]))[0])
    return {"root": root, "ckpt": ckpt, "section": section,
            "sample_img": sample_img}


def test_cli_test_all_modes(trained, tmp_path):
    from db_text_minimal_tpu.cli import test as test_cli

    for extra, expect in (
        (["--heatmap", "true"], "heatmap_result_"),
        (["--is_output_polygon", "true"], "poly_result_"),
        (["--is_output_polygon", "false"], "rect_result_"),
    ):
        args = test_cli.load_args([
            "--image_path", trained["sample_img"],
            "--model_path", trained["ckpt"],
            "--save_dir", str(tmp_path),
            "--thresh", "0.3", "--box_thresh", "0.1"] + extra)
        out = test_cli.main(args)
        assert os.path.exists(out)
        assert expect in os.path.basename(out)


def test_make_eval_and_offline_evals(trained, tmp_path):
    from db_text_minimal_tpu.cli import make_eval, ioueval, deteval

    preds_fp = str(tmp_path / "preds.pkl")
    gts_fp = str(tmp_path / "gts.pkl")
    args = make_eval.load_args([
        "--image_dir", trained["section"]["test_dir"],
        "--model_path", trained["ckpt"],
        "--thresh", "0.3", "--box_thresh", "0.1",
        "--preds_fp", preds_fp,
        "--img_fns_fp", str(tmp_path / "fns.pkl"),
        "--gt_dir", trained["section"]["test_gt_dir"],
        "--dataset", "totaltext",
        "--gts_fp", gts_fp,
    ])
    make_eval.main(args)
    with open(preds_fp, "rb") as f:
        preds = pickle.load(f)
    with open(gts_fp, "rb") as f:
        gts = pickle.load(f)
    assert len(preds) == len(gts) == 2
    assert all(len(g) >= 1 for g in gts)

    m1 = ioueval.main(ioueval.load_args(
        ["--iou", "0.4", "--area", "0.8",
         "--poly_gts_fp", gts_fp, "--poly_preds_fp", preds_fp]))
    m2 = deteval.main(deteval.load_args(
        ["--tp", "0.4", "--tr", "0.8",
         "--poly_gts_fp", gts_fp, "--poly_preds_fp", preds_fp]))
    for m in (m1, m2):
        assert set(m) == {"precision", "recall", "hmean"}
        assert all(0.0 <= v <= 1.0 for v in m.values())


def test_make_eval_rect_default_uses_device_boxes(trained, tmp_path):
    """Rect-mode make_eval with NO --device_boxes flag routes through the
    on-device extractor (the default since the hole-filled-score parity fix,
    demo/hard_bench/device_parity_r3.json) and yields quads close to the
    host path."""
    from db_text_minimal_tpu.cli import make_eval
    from db_text_minimal_tpu.ops import geometry as geo

    common = [
        "--image_dir", trained["section"]["test_dir"],
        "--model_path", trained["ckpt"],
        "--thresh", "0.3", "--box_thresh", "0.1",
        "--img_fns_fp", str(tmp_path / "fns.pkl"),
        "--is_output_polygon", "false",
    ]
    args = make_eval.load_args(common + ["--preds_fp",
                                         str(tmp_path / "dev.pkl")])
    assert args.device_boxes is True
    make_eval.main(args)
    make_eval.main(make_eval.load_args(
        common + ["--device_boxes", "false",
                  "--preds_fp", str(tmp_path / "host.pkl")]))
    with open(tmp_path / "dev.pkl", "rb") as f:
        dev_preds = pickle.load(f)
    with open(tmp_path / "host.pkl", "rb") as f:
        host_preds = pickle.load(f)
    assert len(dev_preds) == len(host_preds) == 2
    matched = total = 0
    for d_img, h_img in zip(dev_preds, host_preds):
        for h_rec in h_img:
            total += 1
            best = max(
                (geo.intersection_area(h_rec["points"], d_rec["points"])
                 for d_rec in d_img), default=0.0)
            if best > 0.5 * abs(geo.polygon_area(h_rec["points"])):
                matched += 1
    assert total >= 1
    assert matched / total >= 0.8


def test_rest_server_roundtrip(trained):
    from db_text_minimal_tpu.serve import make_server

    server = make_server(trained["ckpt"], port=0, model_name="dbtext")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # health check
        with urllib.request.urlopen(
                f"http://localhost:{port}/ping", timeout=30) as r:
            assert json.loads(r.read())["status"] == "Healthy"
        with open(trained["sample_img"], "rb") as f:
            img_bytes = f.read()
        req = urllib.request.Request(
            f"http://localhost:{port}/predictions/dbtext", data=img_bytes,
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            payload = json.loads(r.read())
        prob = np.array(payload["prob_mask"], dtype=np.uint8)
        thresh = np.array(payload["thresh_mask"], dtype=np.uint8)
        assert prob.shape == (640, 640)       # handler pads to 640
        assert thresh.shape == (640, 640)
        # wrong route -> 404
        bad = urllib.request.Request(
            f"http://localhost:{port}/predictions/nope", data=b"x",
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=30)
        assert exc.value.code == 404
    finally:
        server.shutdown()


def test_aot_export_roundtrip(trained, tmp_path):
    import jax.numpy as jnp

    from db_text_minimal_tpu.cli.common import load_model
    from db_text_minimal_tpu.serve import export_model, load_exported

    model, variables = load_model(trained["ckpt"])
    path = str(tmp_path / "db.stablehlo")
    export_model(model, variables, path, input_shape=(1, 128, 128, 3),
                 uint8_input=False)
    infer = load_exported(path)
    x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
    out = np.asarray(infer(x))
    assert out.shape == (1, 128, 128, 2)
    ref = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    # trained checkpoints sit on steep sigmoid cliffs where float-level
    # reassociation flips saturated pixels; demand agreement almost
    # everywhere rather than bitwise closeness
    assert np.mean(np.abs(out - ref) > 1e-3) < 0.01


def test_aot_export_symbolic_batch_uint8(trained, tmp_path):
    """Default export contract: ONE artifact serves any batch size, takes
    raw uint8 input, matches the live fused-head model (the live serving
    path's own preprocessing) at every size."""
    import jax.numpy as jnp

    from db_text_minimal_tpu.cli.common import load_model
    from db_text_minimal_tpu.serve import export_model, load_exported
    from db_text_minimal_tpu.utils import CAFFE_MEAN

    model, variables = load_model(trained["ckpt"], fuse_head=True)
    path = str(tmp_path / "db_sym.stablehlo")
    export_model(model, variables, path,
                 input_shape=(None, 128, 128, 3), uint8_input=True)
    infer = load_exported(path)
    assert infer.meta["uint8_input"] and infer.meta["symbolic_batch"]
    for batch in (1, 3):
        x = np.random.RandomState(batch).randint(
            0, 255, (batch, 128, 128, 3)).astype(np.uint8)
        out = np.asarray(infer(x))
        assert out.shape == (batch, 128, 128, 2)
        ref = np.asarray(model.apply(
            variables,
            jnp.asarray(x, jnp.float32) - jnp.asarray(CAFFE_MEAN,
                                                      jnp.float32),
            train=False))
        assert np.mean(np.abs(out - ref) > 1e-3) < 0.01


def test_aot_export_folded_prob_only(trained, tmp_path):
    """``--infer_mode folded --prob_only`` export: the BN-folded graph
    with a symbolic batch agrees with the live fused-head model's prob map
    (weight-exact rewrites, bf16 compute)."""
    import jax.numpy as jnp

    from db_text_minimal_tpu.cli.common import load_model
    from db_text_minimal_tpu.serve import export_model, load_exported
    from db_text_minimal_tpu.utils import CAFFE_MEAN

    model, variables = load_model(trained["ckpt"], fuse_head=True)
    path = str(tmp_path / "db_folded.stablehlo")
    export_model(model, variables, path,
                 input_shape=(None, 128, 128, 3), uint8_input=True,
                 infer_mode="folded", prob_only=True)
    infer = load_exported(path)
    assert infer.meta["infer_mode"] == "folded" and infer.meta["prob_only"]
    for batch in (1, 2):
        x = np.random.RandomState(batch).randint(
            0, 255, (batch, 128, 128, 3)).astype(np.uint8)
        out = np.asarray(infer(x))
        assert out.shape == (batch, 128, 128, 1)
        ref = np.asarray(model.apply(
            variables,
            jnp.asarray(x, jnp.float32) - jnp.asarray(CAFFE_MEAN,
                                                      jnp.float32),
            train=False))[..., :1]
        # folded path computes convs in bf16; trained sigmoids saturate
        assert np.mean(np.abs(out - ref) > 5e-2) < 0.02


def test_train_cli_with_config_file(tmp_path, monkeypatch):
    """Drive the config-driven train CLI end to end: yaml -> loaders ->
    Trainer.fit -> checkpoints (the `make train` surface)."""
    import yaml

    from db_text_minimal_tpu.cli import train as train_cli
    from db_text_minimal_tpu.data.synthetic import generate

    section = generate(str(tmp_path / "data"), n_train=2, n_test=1, size=128,
                       seed=9)
    cfg_path = tmp_path / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({
            "meta": {"root_dir": str(tmp_path)},
            "hps": {"img_size": 128, "batch_size": 1, "test_batch_size": 1,
                    "no_epochs": 1, "log_iter": 10},
            "data": {"synthetic": section},
            "dataset": {"name": "synthetic"},
            "logging": {"logger_file": None, "log_dir": "logs"},
        }, f)
    args = train_cli.load_args(["--config", str(cfg_path)])
    state, history = train_cli.main(args)
    assert len(history) == 1
    assert os.path.exists(tmp_path / "models" / "last_cp.ckpt")


def test_export_cli(trained, tmp_path):
    from db_text_minimal_tpu.cli import export as export_cli

    out = str(tmp_path / "db.stablehlo")
    path = export_cli.main(["--model_path", trained["ckpt"], "--out", out,
                            "--height", "128", "--width", "128"])
    assert os.path.exists(path) and os.path.exists(path + ".params")


def test_rest_server_concurrent_microbatching(trained):
    """Concurrent requests must coalesce through the batcher and all get
    correct independent responses."""
    import concurrent.futures

    from db_text_minimal_tpu.serve import make_server

    server = make_server(trained["ckpt"], port=0, model_name="dbtext",
                         max_batch=4)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with open(trained["sample_img"], "rb") as f:
            img_bytes = f.read()

        def post(_):
            req = urllib.request.Request(
                f"http://localhost:{port}/predictions/dbtext",
                data=img_bytes, method="POST")
            with urllib.request.urlopen(req, timeout=180) as r:
                return json.loads(r.read())

        with concurrent.futures.ThreadPoolExecutor(4) as pool:
            results = list(pool.map(post, range(4)))
        assert len(results) == 4
        ref = np.array(results[0]["prob_mask"], np.uint8)
        for r in results[1:]:
            np.testing.assert_array_equal(
                np.array(r["prob_mask"], np.uint8), ref)
    finally:
        server.shutdown()


def test_rest_server_masks_png_mode(trained):
    """?mode=masks_png returns the same masks as base64 PNGs — a compact
    alternative to the reference's multi-MB JSON-list contract."""
    import base64
    import io as _io

    from PIL import Image

    from db_text_minimal_tpu.serve import make_server

    server = make_server(trained["ckpt"], port=0, model_name="dbtext")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with open(trained["sample_img"], "rb") as f:
            img_bytes = f.read()

        def post(query=""):
            req = urllib.request.Request(
                f"http://localhost:{port}/predictions/dbtext{query}",
                data=img_bytes, method="POST")
            with urllib.request.urlopen(req, timeout=180) as r:
                raw = r.read()
            return json.loads(raw), len(raw)

        ref, ref_bytes = post()
        png, png_bytes = post("?mode=masks_png")
        assert set(png) == {"prob_png", "thresh_png"}
        assert png_bytes < ref_bytes / 10   # compact response
        for key, ref_key in (("prob_png", "prob_mask"),
                             ("thresh_png", "thresh_mask")):
            mask = np.array(Image.open(_io.BytesIO(
                base64.b64decode(png[key]))))
            np.testing.assert_array_equal(
                mask, np.array(ref[ref_key], dtype=np.uint8))

        # the CLI client decodes the compact response too
        from db_text_minimal_tpu.serve import client as client_cli

        out_dir = os.path.dirname(trained["sample_img"])
        prob, _ = client_cli.main(client_cli.load_args([
            "--image_path", trained["sample_img"], "--port", str(port),
            "--response", "masks_png", "--out_dir", out_dir]))
        np.testing.assert_array_equal(
            prob, np.array(ref["prob_mask"], dtype=np.uint8))
    finally:
        server.shutdown()


def test_rest_server_box_mode(trained):
    """?mode=boxes returns on-device fast boxes instead of full masks."""
    from db_text_minimal_tpu.serve import make_server

    server = make_server(trained["ckpt"], port=0, model_name="dbtext")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with open(trained["sample_img"], "rb") as f:
            img_bytes = f.read()
        req = urllib.request.Request(
            f"http://localhost:{port}/predictions/dbtext?mode=boxes",
            data=img_bytes, method="POST")
        with urllib.request.urlopen(req, timeout=180) as r:
            payload = json.loads(r.read())
        assert set(payload) == {"boxes", "scores"}
        assert len(payload["boxes"]) == len(payload["scores"])
        for box in payload["boxes"]:
            assert len(box) == 4  # xmin, ymin, xmax, ymax
    finally:
        server.shutdown()


def test_cli_accepts_reference_pth_checkpoint(tmp_path):
    """The test CLI loads a reference-format .pth state_dict directly
    (the BASELINE F-measure-parity flow: run db_resnet18.pth on TPU)."""
    import sys

    torch = pytest.importorskip("torch")
    REFERENCE = "/root/reference/src"
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REFERENCE)
    try:
        import modules.resnet as ref_resnet
        ref_resnet.model_zoo.load_url = lambda url: {}
        from models import DBTextModel as TorchDB
    finally:
        sys.path.remove(REFERENCE)
    torch.manual_seed(3)
    pth = str(tmp_path / "db_resnet18.pth")
    torch.save(TorchDB().state_dict(), pth)

    import cv2

    img_path = str(tmp_path / "img.jpg")
    cv2.imwrite(img_path, np.random.RandomState(0).randint(
        0, 255, (128, 128, 3), np.uint8))

    from db_text_minimal_tpu.cli import test as test_cli

    args = test_cli.load_args([
        "--image_path", img_path, "--model_path", pth,
        "--save_dir", str(tmp_path), "--heatmap", "true"])
    out = test_cli.main(args)
    assert os.path.exists(out)


def test_make_eval_batched_matches_single(trained, tmp_path):
    """Batched make_eval (padded square canvas) detects the same regions as
    the per-image path."""
    from db_text_minimal_tpu.cli import make_eval
    from db_text_minimal_tpu.ops import geometry as geo

    common = [
        "--image_dir", trained["section"]["test_dir"],
        "--model_path", trained["ckpt"],
        "--thresh", "0.3", "--box_thresh", "0.1",
        "--img_fns_fp", str(tmp_path / "fns.pkl"),
    ]
    p1 = str(tmp_path / "p1.pkl")
    p2 = str(tmp_path / "p2.pkl")
    make_eval.main(make_eval.load_args(common + ["--preds_fp", p1]))
    make_eval.main(make_eval.load_args(
        common + ["--preds_fp", p2, "--batch_size", "2"]))
    with open(p1, "rb") as f:
        single = pickle.load(f)
    with open(p2, "rb") as f:
        batched = pickle.load(f)
    assert len(single) == len(batched)

    def real_boxes(img_records):
        # sub-pixel noise blobs from this barely-trained fixture round to
        # degenerate slivers whose position depends on the canvas scale;
        # the test's claim is about real detected regions
        return [r for r in img_records
                if abs(geo.polygon_area(np.asarray(r["points"], float))) > 4]

    n_compared = 0
    for s_img, b_img in zip(single, batched):
        s_real, b_real = real_boxes(s_img), real_boxes(b_img)
        assert len(s_real) == len(b_real)
        for s_rec in s_real:
            best = max(
                (geo.intersection_area(s_rec["points"], b_rec["points"])
                 / max(geo.union_area(s_rec["points"], b_rec["points"]),
                       1e-9) for b_rec in b_real), default=0.0)
            assert best > 0.85, (s_rec, b_real)
            n_compared += 1
    assert n_compared > 0   # the fixture must yield real boxes to compare


def test_make_eval_folded_infer_mode_matches_flax(trained, tmp_path):
    """--infer_mode folded (BN-folded, prob-only) finds the same
    regions as the parity flax forward."""
    from db_text_minimal_tpu.cli import make_eval
    from db_text_minimal_tpu.ops import geometry as geo

    common = [
        "--image_dir", trained["section"]["test_dir"],
        "--model_path", trained["ckpt"],
        "--thresh", "0.3", "--box_thresh", "0.1",
        "--img_fns_fp", str(tmp_path / "fns.pkl"),
        "--device_boxes", "false", "--is_output_polygon", "false",
    ]
    p1 = str(tmp_path / "flax.pkl")
    p2 = str(tmp_path / "folded.pkl")
    make_eval.main(make_eval.load_args(common + ["--preds_fp", p1]))
    make_eval.main(make_eval.load_args(
        common + ["--preds_fp", p2, "--infer_mode", "folded"]))
    with open(p1, "rb") as f:
        flax_preds = pickle.load(f)
    with open(p2, "rb") as f:
        folded = pickle.load(f)
    assert len(flax_preds) == len(folded)
    matched = total = 0
    for s_img, b_img in zip(flax_preds, folded):
        for s_rec in s_img:
            total += 1
            best = max(
                (geo.intersection_area(s_rec["points"], b_rec["points"])
                 / max(geo.union_area(s_rec["points"], b_rec["points"]),
                       1e-9) for b_rec in b_img), default=0.0)
            if best > 0.8:
                matched += 1
    assert total >= 1 and matched == total


def test_rest_server_query_mode_parsing():
    """Response mode comes from a parsed ``mode`` query param — an unrelated
    param whose VALUE contains the substring 'mode=boxes' (e.g.
    ``?note=xmode=boxes``) must not flip the mode (ADVICE r2)."""
    from db_text_minimal_tpu.serve import make_server

    seen = []

    class FakeHandler:
        initialized = True

        def handle(self, request, mode="masks"):
            seen.append(mode)
            return [{"ok": True} for _ in request]

    server = make_server("unused", port=0, model_name="dbtext",
                         handler=FakeHandler())
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        for query, expect in [("?mode=boxes&foo=1", "boxes"),
                              ("?note=xmode=boxes", "masks"),
                              ("?mode=masks_png", "masks_png"),
                              ("?mode=bogus", "masks"),
                              ("", "masks")]:
            req = urllib.request.Request(
                f"http://localhost:{port}/predictions/dbtext{query}",
                data=b"img", method="POST")
            with urllib.request.urlopen(req, timeout=30) as r:
                assert json.loads(r.read()) == {"ok": True}
            assert seen[-1] == expect
    finally:
        server.shutdown()


def test_handler_prob_only_rejects_masks_modes():
    """A --prob_only export has no thresh channel; masks/masks_png must be
    rejected with a clear error instead of an IndexError deep in
    postprocess (ADVICE r2)."""
    from db_text_minimal_tpu.serve.handler import DBTextDetectionHandler

    handler = DBTextDetectionHandler(forward=lambda x: x)
    handler._prob_only = True
    for mode in ("masks", "masks_png"):
        with pytest.raises(ValueError, match="prob_only"):
            handler.handle([{"body": b""}], mode=mode)
