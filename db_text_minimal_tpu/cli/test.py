"""Single-image inference CLI: heatmap / polygon / rect visualizations.

Rebuild of ``src/test.py`` (``make test-heatmap/-poly/-rect/-all``,
``Makefile:32-61``).

Usage::

    python -m db_text_minimal_tpu.cli.test --image_path img.jpg \
        --model_path models/best_cp.ckpt --is_output_polygon true
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp
import numpy as np

from ..utils import read_img, test_preprocess
from ..utils.visualize import visualize_heatmap, visualize_polygon
from .common import (add_inference_args, build_inference_forward,
                     make_forward)


def load_args(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    add_inference_args(parser)
    return parser.parse_args(argv)


def main(args, net=None, variables=None):
    """``src/test.py:45-67``."""
    img_path = args.image_path.replace("file://", "")
    img_fn = img_path.split("/")[-1]
    assert os.path.exists(img_path), img_path
    img_origin, h_origin, w_origin = read_img(img_path)
    tmp_img = test_preprocess(img_origin, pad=False)

    if net is None:
        net, variables, forward = build_inference_forward(
            args.model_path, backbone=args.backbone,
            infer_mode=getattr(args, "infer_mode", "flax"))
    else:
        forward = make_forward(net)

    start = time.time()
    preds = np.asarray(forward(variables, jnp.asarray(tmp_img)))
    print(">>> Inference took {}'s".format(time.time() - start))

    os.makedirs(args.save_dir, exist_ok=True)
    if args.heatmap:
        return visualize_heatmap(args, img_fn, tmp_img[0], preds[0])
    batch = {"shape": [(h_origin, w_origin)]}
    return visualize_polygon(args, img_fn, (img_origin, h_origin, w_origin),
                             batch, preds)


if __name__ == "__main__":
    main(load_args())
