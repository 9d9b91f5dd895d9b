"""Config system tests: defaults, yaml overlay, strict=False semantics."""

import yaml

from db_text_minimal_tpu.config import ConfigNode, default_config, \
    load_config, save_config


def test_defaults_mirror_reference_values():
    cfg = default_config()
    assert cfg.hps.batch_size == 4
    assert cfg.hps.img_size == 640
    assert cfg.lrs.mode == "reduce"
    assert cfg.optimizer.lr == 0.005
    assert cfg.optimizer.beta == 10
    assert cfg.metric.thred_text_score == 0.25
    assert cfg.data.icdar2015.ignore_tags == ["###"]


def test_missing_keys_resolve_to_none():
    cfg = default_config()
    assert cfg.nonexistent_section is None       # hydra strict=False
    assert cfg.meta.nonexistent_key is None


def test_yaml_overlay_deep_merges(tmp_path):
    path = tmp_path / "config.yaml"
    with open(path, "w") as f:
        yaml.safe_dump({"hps": {"batch_size": 16},
                        "custom": {"x": 1}}, f)
    cfg = load_config(str(path))
    assert cfg.hps.batch_size == 16
    assert cfg.hps.img_size == 640        # untouched defaults survive
    assert cfg.custom.x == 1


def test_missing_file_falls_back_to_defaults(tmp_path):
    cfg = load_config(str(tmp_path / "nope.yaml"))
    assert cfg.hps.batch_size == 4


def test_save_roundtrip(tmp_path):
    cfg = load_config(overrides={"hps": {"batch_size": 7}})
    path = str(tmp_path / "saved.yaml")
    save_config(cfg, path)
    cfg2 = load_config(path)
    assert cfg2.hps.batch_size == 7


def test_overrides_win_over_file(tmp_path):
    path = tmp_path / "config.yaml"
    with open(path, "w") as f:
        yaml.safe_dump({"hps": {"batch_size": 16}}, f)
    cfg = load_config(str(path), overrides={"hps": {"batch_size": 2}})
    assert cfg.hps.batch_size == 2
