"""Shared CLI infrastructure: model loading and the unified argument set.

The reference duplicated inference thresholds between the Makefile and each
CLI's argparse defaults (``Makefile:26-29`` vs ``src/test.py:35-37``); here
every CLI draws defaults from the same config system and accepts the same
overrides.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..models import DBTextModel
from ..train.checkpoints import load_params_any
from ..utils import str_to_bool


def load_model(model_path: str, backbone: str = "resnet18",
               neck: str = "FPN", head: str = "DBHead", dtype=None,
               fuse_head: bool = False):
    """``src/test.py:13-18`` equivalent: build + restore weights from a
    native ``.ckpt`` or a reference ``.pth``. Returns (model, variables).
    ``fuse_head=True`` rewrites the head into the weight-equivalent
    ``FusedDBHead`` inference layout (~19 % faster head on TPU)."""
    assert os.path.exists(model_path), model_path
    if dtype is None:
        dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                 else jnp.float32)
    variables = load_params_any(model_path)
    if fuse_head and head == "DBHead":
        from ..models.head import fuse_variables

        variables = fuse_variables(variables)
        head = "FusedDBHead"
    # structured-pruning sidecar (models/prune.py): a pruned checkpoint
    # carries its channel widths next to it and loads transparently
    from ..models.prune import load_widths, widths_to_model_kwargs

    widths = widths_to_model_kwargs(load_widths(model_path))
    model = DBTextModel(backbone_name=backbone, neck_name=neck,
                        head_name=head, dtype=dtype, **widths)
    return model, variables


def make_forward(model: DBTextModel):
    @jax.jit
    def forward(variables, x):
        return model.apply(variables, x, train=False)

    return forward


def make_folded_forward(variables, quantize: bool = False,
                        stem_s2d: bool = False, prob_only: bool = False,
                        calibration=None):
    """Folded inference forward for the flagship resnet18+FPN config
    (``models/quant_infer``): BN folded offline, optional int8 PTQ of the
    MXU-filling convs, optional space-to-depth stem and prob-only head.
    ``variables`` must be in FusedDBHead layout (``load_model`` with
    ``fuse_head=True``). Returns a ``forward(variables_ignored, x)``
    drop-in for ``make_forward``'s signature."""
    from functools import partial

    from ..models.quant_infer import (calibrate_activation_scales,
                                      prepare_quant_params,
                                      quant_dbnet_forward)

    # skip=() quantizes the fused head conv1 too; stem_s2d and deconv_d2s
    # both measured NEGATIVE on hardware and default off (the full mode
    # matrix is in docs/PERFORMANCE.md / demo/hard_bench/infer_modes.json)
    qv = prepare_quant_params(
        jax.device_get(variables),
        skip=(),
        min_out_channels=128 if quantize else 10**9,
        stem_s2d=stem_s2d)
    if quantize and calibration is not None:
        qv = calibrate_activation_scales(qv, calibration)
    qv = jax.device_put(qv)
    fwd = jax.jit(partial(quant_dbnet_forward, prob_only=prob_only))
    return lambda _variables, x: fwd(qv, x)


def build_inference_forward(model_path: str, backbone: str = "resnet18",
                            infer_mode: str = "flax",
                            prob_only: bool = True):
    """One-stop inference builder for the CLIs: returns
    (model, variables, forward) where ``forward(variables, x)`` maps images
    to prediction maps. ``infer_mode`` ``"folded"``/``"int8"`` selects the
    BN-folded weight-exact rewrite path (``models/quant_infer``; flagship
    resnet18+FPN only) — with ``prob_only`` it returns (N, H, W, 1), which
    is all the detection postprocess reads (``src/postprocess.py:33``)."""
    if infer_mode != "flax":
        assert backbone == "resnet18", \
            "--infer_mode folded/int8 supports the flagship resnet18+FPN"
        net, variables = load_model(model_path, backbone=backbone,
                                    fuse_head=True)
        forward = make_folded_forward(variables,
                                      quantize=infer_mode == "int8",
                                      prob_only=prob_only)
    else:
        net, variables = load_model(model_path, backbone=backbone)
        forward = make_forward(net)
    return net, variables, forward


def add_inference_args(parser: argparse.ArgumentParser) -> None:
    """The shared argparse surface of ``src/test.py:21-42``."""
    parser.add_argument("--image_path", type=str, default="./assets/foo.jpg")
    parser.add_argument("--model_path", type=str,
                        default="./models/best_cp.ckpt")
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--save_dir", type=str, default="./assets")
    parser.add_argument("--device", type=str, default=None,
                        help="unused; kept for reference CLI parity")
    parser.add_argument("--prob_thred", type=float, default=0.5)
    parser.add_argument("--heatmap", type=str_to_bool, default=False)
    parser.add_argument("--thresh", type=float, default=0.5)
    parser.add_argument("--box_thresh", type=float, default=0.7)
    parser.add_argument("--unclip_ratio", type=float, default=1.5)
    parser.add_argument("--is_output_polygon", type=str_to_bool,
                        default=False)
    parser.add_argument("--alpha", type=float, default=0.6)
    parser.add_argument("--infer_mode", type=str, default="flax",
                        choices=("flax", "folded", "int8"),
                        help="flax = parity forward; folded = BN-folded "
                             "prob-only forward (same numerics class, "
                             "faster); int8 = + PTQ of the wide convs")
