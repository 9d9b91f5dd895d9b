"""Quality-benchmark driver smoke test (tiny CPU run)."""

import json
import os

import pytest


@pytest.mark.slow
def test_quality_bench_end_to_end(tmp_path):
    from db_text_minimal_tpu.data.synthetic import generate
    from db_text_minimal_tpu.cli.quality_bench import load_args, main

    generate(str(tmp_path / "ds"), n_train=2, n_test=2, size=192, seed=11)
    out = str(tmp_path / "metrics.json")
    ckpt = str(tmp_path / "m.ckpt")
    args = load_args(["--data_dir", str(tmp_path / "ds"), "--out", out,
                      "--epochs", "1", "--batch_size", "2",
                      "--test_batch_size", "2", "--img_size", "192",
                      "--eval_every", "1", "--save_checkpoint", ckpt])
    report = main(args)
    assert os.path.exists(out) and os.path.exists(ckpt)
    data = json.load(open(out))
    for rep in ("host", "device"):
        for proto in ("iou_pascal", "deteval"):
            assert set(data["results"][rep][proto]) == {
                "precision", "recall", "hmean"}
    assert data["results"]["n_test_images"] == 2
    assert len(data["history"]) == 1 and "test_loss" in data["history"][0]

    # eval_only + quant path reuses the checkpoint
    out2 = str(tmp_path / "metrics_q.json")
    args = load_args(["--data_dir", str(tmp_path / "ds"), "--out", out2,
                      "--eval_only", "--checkpoint", ckpt, "--quant",
                      "--test_batch_size", "2", "--img_size", "192"])
    report = main(args)
    assert report["config"]["quant"] is True
    assert os.path.exists(out2)


@pytest.mark.slow
def test_checkpoint_saved_before_final_eval(tmp_path, monkeypatch):
    """A tunnel outage during the final eval must not lose the training:
    the checkpoint (and its provenance sidecar) are written before
    full_eval runs (a real remote_compile drop cost a 10-epoch run)."""
    from db_text_minimal_tpu.data.synthetic import generate
    from db_text_minimal_tpu.cli import quality_bench as qb

    generate(str(tmp_path / "ds"), n_train=2, n_test=2, size=192, seed=11)
    ckpt = str(tmp_path / "m.ckpt")

    def boom(*a, **k):
        raise RuntimeError("simulated tunnel outage")

    monkeypatch.setattr(qb, "full_eval", boom)
    args = qb.load_args(["--data_dir", str(tmp_path / "ds"),
                         "--out", str(tmp_path / "metrics.json"),
                         "--epochs", "1", "--batch_size", "2",
                         "--test_batch_size", "2", "--img_size", "192",
                         "--save_checkpoint", ckpt])
    with pytest.raises(RuntimeError, match="simulated tunnel outage"):
        qb.main(args)
    assert os.path.exists(ckpt)
    assert os.path.exists(ckpt + ".train_config.json")


def test_ctw_polygon_operating_point_warning(capsys):
    """VERDICT r3 ask #8: CTW line-level polygon eval at unclip < 2.0 is a
    measured collapse (F .27 vs .82) — the CLI must announce it."""
    from db_text_minimal_tpu.cli.quality_bench import (
        load_args, warn_ctw_polygon_operating_point)

    base = ["--data_dir", "/nonexistent", "--out", "/tmp/x.json",
            "--dataset_format", "ctw1500", "--polygon"]
    assert warn_ctw_polygon_operating_point(load_args(base)) is True
    assert "unclip_ratio 2.5" in capsys.readouterr().err

    ok = warn_ctw_polygon_operating_point(
        load_args(base + ["--unclip_ratio", "2.5"]))
    assert ok is False
    # rect mode / totaltext at the default stays silent
    assert warn_ctw_polygon_operating_point(load_args(
        ["--data_dir", "/n", "--out", "/tmp/x.json"])) is False


def test_line_level_preset_sets_polygon_and_unclip():
    from db_text_minimal_tpu.cli.quality_bench import load_args

    base = ["--data_dir", "/n", "--out", "/tmp/x.json",
            "--dataset_format", "ctw1500"]
    a = load_args(base + ["--line_level"])
    assert a.polygon is True and a.unclip_ratio == 2.5
    # explicit unclip wins over the preset
    a = load_args(base + ["--line_level", "--unclip_ratio", "3.0"])
    assert a.unclip_ratio == 3.0
    # without the preset the reference default holds
    a = load_args(base)
    assert a.polygon is False and a.unclip_ratio == 1.5
