"""Unified YAML config system.

Replaces the reference's split configuration (hydra for training at
``src/train.py:322-324`` with ``strict=False``, argparse + Makefile-duplicated
defaults for every other CLI, ``Makefile:26-29`` / ``src/test.py:35-37``) with
one dot-accessible config used by every entry point. Keys and semantics mirror
``example_config.yaml`` of the reference; missing keys resolve to defaults
(the ``strict=False`` behavior).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Mapping

import yaml


class ConfigNode(dict):
    """A dict with attribute access; missing keys return ``None`` like
    hydra/omegaconf ``strict=False`` lookups in the reference."""

    def __getattr__(self, name: str) -> Any:
        if name.startswith("__"):
            raise AttributeError(name)
        value = self.get(name)
        if isinstance(value, dict) and not isinstance(value, ConfigNode):
            value = ConfigNode(value)
            self[name] = value
        return value

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __getitem__(self, key):
        value = dict.get(self, key)
        if isinstance(value, dict) and not isinstance(value, ConfigNode):
            value = ConfigNode(value)
            dict.__setitem__(self, key, value)
        return value


def _deep_update(base: dict, overrides: Mapping) -> dict:
    for key, value in overrides.items():
        if (
            isinstance(value, Mapping)
            and isinstance(base.get(key), Mapping)
        ):
            _deep_update(base[key], value)
        else:
            base[key] = copy.deepcopy(value)
    return base


def _dataset_section(train_dir="", test_dir="", train_gt_dir="",
                     test_gt_dir="", ignore_tags=()):
    return {
        "train_dir": train_dir,
        "test_dir": test_dir,
        "train_gt_dir": train_gt_dir,
        "test_gt_dir": test_gt_dir,
        "ignore_tags": list(ignore_tags),
    }


def default_config() -> ConfigNode:
    """Defaults mirroring the reference ``example_config.yaml`` (all sections,
    same keys and values), adapted for TPU: ``device`` names a JAX platform
    and a ``parallel`` section configures the device mesh (new capability —
    the reference is single-device, SURVEY.md §2c)."""
    return ConfigNode({
        "meta": {
            "root_dir": ".",
            "debug": False,
            "device": "tpu",          # reference: cuda (example_config.yaml:5)
            "test_device": "cpu",
        },
        "hps": {
            "batch_size": 4,
            "test_batch_size": 1,      # must be 1 to evaluate box metrics
            "img_size": 640,
            "no_epochs": 100,
            "warmup_epochs": 10,
            "no_classes": 2,
            "log_iter": 50,
        },
        "lrs": {
            "mode": "reduce",          # reduce / poly
            "warmup_iters": 10,
            # poly decay horizon in steps; 0 reproduces the reference quirk
            # (instantiated without max_iters -> decays to 0 after warmup)
            "max_iters": 0,
            "factor": 0.2,
            "patience": 4,
        },
        "augmentation": None,
        "callbacks": None,
        "data": {
            "totaltext": _dataset_section(ignore_tags=["#"]),
            "ctw1500": _dataset_section(ignore_tags=[]),
            "icdar2015": _dataset_section(ignore_tags=["###"]),
            "msra_td500": _dataset_section(ignore_tags=[]),
            "synthetic": _dataset_section(ignore_tags=["###"]),
            # beyond-reference formats (its unchecked TODOs,
            # reference README.md:100-102)
            "cocotext": _dataset_section(ignore_tags=["###"]),
            "synthtext": _dataset_section(ignore_tags=["###"]),
            "art2019": _dataset_section(ignore_tags=["###"]),
        },
        "dataset": {
            "name": "totaltext",
            "return_dict": True,
        },
        "logging": {
            "logger_file": "train.log",
            "log_dir": "logs",
        },
        "loss": None,
        "model": {
            "backbone": "resnet18",
            "neck": "FPN",
            "head": "DBHead",
            "finetune_cp_path": None,
            "pretrained_backbone_path": None,  # torchvision resnet .pth
            "best_cp_path": "models/best_cp.ckpt",
            "last_cp_path": "models/last_cp.ckpt",
            "best_hmean_cp_path": "models/best_hmean_cp.ckpt",
        },
        "optimizer": {
            "type": "adam",
            "lr": 0.005,
            "lr_finetune": 0.001,
            "weight_decay": 0.0,
            # true per-pixel OHEM. Measured equal step cost to the
            # reference's degenerate 'mean' compat mode (bisection top-k,
            # demo/hard_bench/ohem_probe.json) and better quality
            # (+2.0 IoU-F / +6.5 DetEval-F at 10 epochs on the hard
            # benchmark); set 'mean' for reference train-loss parity
            "reduction": "none",
            "alpha": 1,
            "beta": 10,
            "negative_ratio": 3,
            "amsgrad": False,
            # deformable backbones only: LR multiplier for the DCN
            # sampling-offset branch (1.0 = reference parity; see
            # train.trainer.make_optimizer)
            "dcn_offset_lr_mult": 1.0,
        },
        "metric": {
            "thred_text_score": 0.25,
            "prob_threshold": 0.50,
            "unclip_ratio": 1.50,
            "is_output_polygon": True,
            # rect-mode eval path: True = on-device box extractor
            # (threshold+CC+oriented rects under jit), False = host
            # SegDetectorRepresenter (the parity path). Default ON:
            # with hole-filled component scoring the device path matches
            # host within 0.1 pt on every committed checkpoint
            # (scratch10 / 30ep / 40ep, both protocols —
            # demo/hard_bench/device_parity_r3.json).
            "device_boxes": True,
            # ...and the PER-EPOCH eval inside a long-lived TRAINING
            # process now also defaults to the device representer: the
            # round-5 discriminating probe (diag_inproc.py on the exact
            # suspect class, demo/hard_bench/diag_inproc.json) evaluated
            # the same checkpoint before and after 1000 in-process
            # optimizer steps and measured BITWISE-identical maps and box
            # outputs (compare_phases.py) with device-host deltas of
            # -0.0002/-0.0002/-0.0006 across all three phases — refuting
            # the 2026-08-17 "in-process device rows ~4 F-points low"
            # observations (docs/PERFORMANCE.md RESOLVED note; those rows
            # are attributed to the tunnel-corruption class certified in
            # round 3). Set False to force the host representer for
            # in-train evals.
            "device_boxes_in_train": True,
        },
        "parallel": {
            "data_axis": "data",
            "num_devices": None,       # None = all visible devices
            "compute_dtype": "bfloat16",
            "param_dtype": "float32",
        },
        "private": None,
        "scheduler": None,
        "trainer": {
            "seed": 42,
        },
        "training": None,
    })


def load_config(path: str | None = None,
                overrides: Mapping | None = None) -> ConfigNode:
    """Load config.yaml over defaults; ``overrides`` applied last."""
    cfg = default_config()
    if path is None:
        for candidate in ("config.yaml", "example_config.yaml"):
            if os.path.exists(candidate):
                path = candidate
                break
    if path is not None and os.path.exists(path):
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        _deep_update(cfg, loaded)
    if overrides:
        _deep_update(cfg, overrides)
    return ConfigNode(cfg)


def save_config(cfg: Mapping, path: str) -> None:
    def plain(obj):
        if isinstance(obj, Mapping):
            return {k: plain(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [plain(v) for v in obj]
        return obj
    with open(path, "w") as f:
        yaml.safe_dump(plain(cfg), f, sort_keys=False)
