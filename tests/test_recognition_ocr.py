"""Recognition model + full OCR pipeline + webcam/video tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from db_text_minimal_tpu.models.recognition import (AttnLabelConverter,
                                                    CTCLabelConverter,
                                                    RecognitionModel,
                                                    predict, rec_preprocess)

CHARSET = "0123456789abcdefghijklmnopqrstuvwxyz"


def test_all_stage_combinations_forward():
    x = jnp.zeros((1, 32, 100, 1))
    # CTC sequence length = extractor output width (clova: VGG 24, RCNN 26,
    # ResNet 24 at 32x100); Attn always decodes batch_max_length+1 steps
    ctc_t = {"VGG": 24, "RCNN": 26, "ResNet": 24}
    for trans, feat, seq, pred in [
        ("None", "VGG", "None", "CTC"),
        ("None", "RCNN", "BiLSTM", "CTC"),
        ("TPS", "VGG", "BiLSTM", "Attn"),
        ("None", "ResNet", "BiLSTM", "Attn"),
    ]:
        m = RecognitionModel(num_class=38, transformation=trans,
                             feature_extraction=feat, sequence_modeling=seq,
                             prediction=pred)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        t_expect = 26 if pred == "Attn" else ctc_t[feat]
        assert out.shape == (1, t_expect, 38), (trans, feat, seq, pred)
        assert not bool(jnp.isnan(out).any()), (trans, feat, seq, pred)


def test_ctc_converter_roundtrip():
    c = CTCLabelConverter(CHARSET)
    assert len(c.character) == 37  # blank + 36
    enc, lens = c.encode(["hello"])
    assert lens[0] == 5
    # greedy path with repeats and blanks decodes back
    seq = []
    for idx in enc[0][:5]:
        seq += [idx, idx, 0]
    decoded = c.decode(np.array(seq), [len(seq)])
    assert decoded == ["hello"]


def test_attn_converter_roundtrip():
    a = AttnLabelConverter(CHARSET)
    assert len(a.character) == 38  # [GO], [s] + 36
    enc, lens = a.encode(["hi"])
    assert enc[0][0] == 0                      # [GO]
    decoded = a.decode(enc[:, 1:], lens)
    assert decoded[0] == "hi[s]"


def test_rec_preprocess_shapes(rng):
    img = (rng.rand(48, 180, 3) * 255).astype(np.uint8)
    out = rec_preprocess(img)
    assert out.shape == (1, 32, 100, 1)
    assert -1.0 <= out.min() and out.max() <= 1.0
    padded = rec_preprocess(img, pad=True)
    assert padded.shape == (1, 32, 100, 1)


def test_predict_contract(rng):
    m = RecognitionModel(num_class=38, feature_extraction="VGG",
                         sequence_modeling="None", prediction="Attn")
    x = rng.rand(1, 32, 100, 1).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    conv = AttnLabelConverter(CHARSET)
    result = predict(x, conv, m, v, prediction="Attn")
    assert set(result) == {"pred", "score"}
    assert isinstance(result["pred"], str)
    assert 0.0 <= result["score"] <= 1.0


@pytest.mark.parametrize("pred_head", ["CTC", "Attn"])
def test_predict_batch_matches_per_item(rng, pred_head):
    """Batched decode (one device call per chunk) must reproduce the
    per-crop ``predict`` results element for element."""
    from db_text_minimal_tpu.models.recognition import predict_batch

    num_class = 37 if pred_head == "CTC" else 38
    conv = (CTCLabelConverter(CHARSET) if pred_head == "CTC"
            else AttnLabelConverter(CHARSET))
    m = RecognitionModel(num_class=num_class, feature_extraction="VGG",
                         sequence_modeling="None", prediction=pred_head)
    x = (rng.rand(5, 32, 100, 1).astype(np.float32) - 0.5) * 2
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    batched = predict_batch(x, conv, m, v, prediction=pred_head)
    assert len(batched) == 5
    for i, res in enumerate(batched):
        single = predict(x[i:i + 1], conv, m, v, prediction=pred_head)
        assert res["pred"] == single["pred"]
        assert res["score"] == pytest.approx(single["score"], abs=1e-6)


def test_predict_chunked_pads_last_chunk(rng):
    """_predict_chunked pads the tail chunk to a static shape and slices
    the results back — the output must align 1:1 with the inputs."""
    from db_text_minimal_tpu.cli.rec_bench import _predict_chunked, load_args

    m = RecognitionModel(num_class=37, feature_extraction="VGG",
                         sequence_modeling="None", prediction="CTC")
    conv = CTCLabelConverter(CHARSET)
    xs = [(rng.rand(1, 32, 100, 1).astype(np.float32) - 0.5) * 2
          for _ in range(7)]
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(xs[0]), train=False)
    args = load_args(["--mode", "rec", "--data_dir", "x", "--out", "y",
                      "--saved_model", "z", "--Prediction", "CTC"])
    fwd = jax.jit(lambda vv, t: m.apply(vv, t, train=False))
    chunked = _predict_chunked(xs, conv, m, v, args, fwd, batch=3)
    assert len(chunked) == 7
    for x, res in zip(xs, chunked):
        single = predict(x, conv, m, v, prediction="CTC")
        assert res["pred"] == single["pred"]
        assert res["score"] == pytest.approx(single["score"], abs=1e-6)


def test_attention_teacher_forcing_mode():
    m = RecognitionModel(num_class=38, feature_extraction="VGG",
                         sequence_modeling="None", prediction="Attn")
    x = jnp.zeros((2, 32, 100, 1))
    text = jnp.zeros((2, 27), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = m.apply(v, x, text=text, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 26, 38)


# ---------------------------------------------------------------------------
# OCR pipeline + webcam on the synthetic detector checkpoint
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def det_ckpt(tmp_path_factory):
    from db_text_minimal_tpu.config import load_config
    from db_text_minimal_tpu.data import DataLoader, TotalTextDataset
    from db_text_minimal_tpu.data.synthetic import generate
    from db_text_minimal_tpu.train import Trainer

    root = tmp_path_factory.mktemp("ocr_e2e")
    section = generate(str(root / "data"), n_train=2, n_test=1, size=128,
                       seed=5)
    cfg = load_config(overrides={
        "meta": {"root_dir": str(root)},
        "hps": {"img_size": 128, "batch_size": 1, "test_batch_size": 1,
                "no_epochs": 1, "log_iter": 10},
        "data": {"synthetic": section},
        "dataset": {"name": "synthetic"},
        "logging": {"logger_file": None},
    })
    loaders = [
        DataLoader(TotalTextDataset(section["train_dir"],
                                    section["train_gt_dir"], ["###"],
                                    is_training=True, image_size=128),
                   1, prefetch=0),
        DataLoader(TotalTextDataset(section["test_dir"],
                                    section["test_gt_dir"], ["###"],
                                    is_training=False, image_size=128),
                   1, prefetch=0),
    ]
    Trainer(cfg, *loaders).fit(no_epochs=1)
    img = os.path.join(section["test_dir"],
                       sorted(os.listdir(section["test_dir"]))[0])
    return str(root / "models" / "last_cp.ckpt"), img


def test_ocr_pipeline_end_to_end(det_ckpt, tmp_path, monkeypatch):
    from db_text_minimal_tpu.cli import ocr

    ckpt, sample = det_ckpt
    monkeypatch.chdir(tmp_path)
    out_path = str(tmp_path / "ocr_out.jpg")
    opt = ocr.load_args([
        "--img_path", sample,
        "--det_model_path", ckpt,
        "--out_path", out_path,
        "--thresh", "0.3", "--box_thresh", "0.1",
        "--Transformation", "None", "--FeatureExtraction", "VGG",
        "--SequenceModeling", "None", "--Prediction", "CTC",
    ])
    results = ocr.main(opt)
    assert os.path.exists(out_path)
    assert isinstance(results, list)
    for r in results:
        assert "pred" in r and "score" in r and "box" in r


def test_ocr_folder_mode(det_ckpt, tmp_path):
    import cv2

    from db_text_minimal_tpu.cli import ocr

    crop_dir = tmp_path / "crops"
    crop_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        cv2.imwrite(str(crop_dir / f"word_{i}.jpg"),
                    (rng.rand(32, 100, 3) * 255).astype(np.uint8))
    opt = ocr.load_args([
        "--img_folder", str(crop_dir),
        "--Transformation", "None", "--FeatureExtraction", "VGG",
        "--SequenceModeling", "None", "--Prediction", "CTC",
    ])
    results = ocr.main(opt)
    assert len(results) == 2


def test_webcam_video_mode(det_ckpt, tmp_path):
    import cv2

    from db_text_minimal_tpu.cli import webcam

    ckpt, sample = det_ckpt
    # build a 4-frame video from the sample image
    frame = cv2.imread(sample)
    video_path = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (frame.shape[1], frame.shape[0]))
    for _ in range(4):
        writer.write(frame)
    writer.release()

    out_path = str(tmp_path / "out.mp4")
    args = webcam.load_args([
        "--det_model_path", ckpt,
        "--video_path", video_path,
        "--out_path", out_path,
        "--per_frame", "2",
        "--thresh", "0.3", "--box_thresh", "0.1",
        "--max_frames", "4",
    ])
    count = webcam.main(args)
    assert count == 4
    assert os.path.exists(out_path) and os.path.getsize(out_path) > 0


def test_webcam_video_with_recognition(det_ckpt, tmp_path):
    """Video mode with --recognize: detection boxes feed perspective crops
    into the (random-init) recognition model; overlay text is rendered."""
    import cv2

    from db_text_minimal_tpu.cli import webcam

    ckpt, sample = det_ckpt
    frame = cv2.imread(sample)
    video_path = str(tmp_path / "in.mp4")
    writer = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (frame.shape[1], frame.shape[0]))
    for _ in range(2):
        writer.write(frame)
    writer.release()

    out_path = str(tmp_path / "out.mp4")
    args = webcam.load_args([
        "--det_model_path", ckpt,
        "--video_path", video_path,
        "--out_path", out_path,
        "--per_frame", "1",
        "--recognize",
        "--thresh", "0.3", "--box_thresh", "0.1",
        "--max_frames", "2",
        "--FeatureExtraction", "VGG", "--SequenceModeling", "None",
        "--Prediction", "CTC", "--output_channel", "128",
        "--hidden_size", "64",
    ])
    count = webcam.main(args)
    assert count == 2
    assert os.path.exists(out_path) and os.path.getsize(out_path) > 0
