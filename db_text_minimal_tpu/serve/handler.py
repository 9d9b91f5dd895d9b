"""Serving handler: preprocess → inference → postprocess.

Contract-compatible rebuild of the reference TorchServe handler
(``src/db_handler.py:51-120``): request bytes → PIL decode → aspect resize +
Caffe-mean subtract → model forward → per-image JSON with ``prob_mask`` /
``thresh_mask`` as uint8 (×255) nested lists. Box extraction stays
client-side, as in the reference (SURVEY.md §3.4).

One deliberate divergence: images are padded to the square 640 canvas
(``pad=True``) where the reference used ``pad=False`` — its ``torch.cat``
batching would crash on mixed aspect ratios anyway (``db_handler.py:86``);
padding gives every request a static shape, so micro-batched requests share
one compiled TPU program.

The model can be a live (model, variables) pair or an AOT export artifact
(``export.load_exported``). Lazy first-request initialization mirrors
``db_handler.py:109-120``.
"""

from __future__ import annotations

import io
from typing import Any

import numpy as np




class DBTextDetectionHandler:
    """``src/db_handler.py:51-106``."""

    def __init__(self, model_path: str | None = None, forward=None,
                 infer_mode: str = "folded"):
        """``infer_mode`` (live checkpoints only — exports bake their own):
        ``"folded"`` (default) serves the weight-exact BN-folded forward;
        ``"int8"`` additionally quantizes the MXU-filling convs (PTQ,
        dynamic activation scales); ``"flax"`` serves the plain fused-head
        model. The folded forward is specific to the flagship resnet18+FPN
        configuration."""
        self.model_path = model_path
        self.infer_mode = infer_mode
        self._forward = forward
        self._forward_prob = None   # prob-only graph for mode="boxes"
        self.initialized = forward is not None

    def initialize(self) -> None:
        assert self.model_path is not None
        if self.model_path.endswith(".stablehlo"):
            from .export import load_exported
            from ..utils import CAFFE_MEAN

            infer = load_exported(self.model_path)
            # a prob-only export has no thresh channel: masks modes would
            # die on pred[..., 1] deep in postprocess — reject up front
            self._prob_only = bool(infer.meta.get("prob_only"))
            if infer.meta.get("uint8_input"):
                # uint8 upload; mean subtraction is baked into the graph
                self._forward = infer
            else:
                # legacy artifact traced on mean-subtracted f32 input
                self._forward = lambda x: infer(
                    np.asarray(x, np.float32) - np.asarray(CAFFE_MEAN,
                                                           np.float32))
        else:
            import jax
            import jax.numpy as jnp

            from ..cli.common import load_model
            from ..utils import CAFFE_MEAN

            # serving uses the weight-equivalent fused inference head
            model, variables = load_model(self.model_path, fuse_head=True)
            mean = jnp.asarray(CAFFE_MEAN, jnp.float32)

            if self.infer_mode != "flax":
                from functools import partial

                from ..models.quant_infer import (prepare_quant_params,
                                                  quant_dbnet_forward)

                # stem_s2d / deconv_d2s measured negative — defaults off
                qv = jax.device_put(prepare_quant_params(
                    jax.device_get(variables), skip=(),
                    min_out_channels=(128 if self.infer_mode == "int8"
                                      else 10**9)))

                @partial(jax.jit, static_argnames=("prob_only",))
                def fwd(x, prob_only=False):
                    # uint8 upload; mean-subtract on device (4x less H2D)
                    return quant_dbnet_forward(qv,
                                               x.astype(jnp.float32) - mean,
                                               prob_only=prob_only)

                # box mode reads only the prob map — skip the thresh tail
                # (2 deconvs + sigmoid at the largest spatial sizes)
                self._forward_prob = lambda x: fwd(x, prob_only=True)
            else:
                @jax.jit
                def fwd(x):
                    x = x.astype(jnp.float32) - mean
                    return model.apply(variables, x, train=False)

            self._forward = fwd
        self.initialized = True

    def preprocess(self, request: list[dict[str, Any]]) -> np.ndarray:
        """bytes → uint8 NHWC batch (``src/db_handler.py:73-87``; the mean
        subtraction happens on device — see ``initialize``)."""
        from ..utils import test_resize
        from PIL import Image

        imgs = []
        for data in request:
            image = data.get("data")
            if image is None:
                image = data.get("body")
            arr = np.array(Image.open(io.BytesIO(image)).convert("RGB"))
            imgs.append(test_resize(arr, size=640, pad=True)[None])
        return np.concatenate(imgs, axis=0)

    def inference(self, img: np.ndarray):
        return self._forward(img)

    def postprocess(self, data) -> list[dict]:
        """maps ×255 as JSON-able lists (``src/db_handler.py:92-103``)."""
        res = []
        for pred in np.asarray(data):
            prob_mask = (pred[..., 0] * 255).astype(np.uint8)
            thresh_mask = (pred[..., 1] * 255).astype(np.uint8)
            res.append({"prob_mask": prob_mask.tolist(),
                        "thresh_mask": thresh_mask.tolist()})
        return res

    def postprocess_png(self, data) -> list[dict]:
        """Compact mask response (no reference counterpart): the JSON-list
        contract ships two 640² masks as ~4.5 MB of text per image; this
        mode returns the same masks as base64 PNGs (~50-100 kB), decodable
        with any image library. Opt-in via ``?mode=masks_png``."""
        import base64

        from PIL import Image

        res = []
        for pred in np.asarray(data):
            entry = {}
            for key, ch in (("prob_png", 0), ("thresh_png", 1)):
                mask = (pred[..., ch] * 255).astype(np.uint8)
                buf = io.BytesIO()
                Image.fromarray(mask, mode="L").save(buf, format="PNG")
                entry[key] = base64.b64encode(buf.getvalue()).decode("ascii")
            res.append(entry)
        return res

    def postprocess_boxes(self, data, thresh: float = 0.3,
                          box_thresh: float = 0.7,
                          unclip_ratio: float = 1.5) -> list[dict]:
        """Fast box mode (no reference counterpart — the reference always
        returns full masks and leaves boxes to the client, SURVEY.md §3.4):
        one batched on-device pass (threshold → connected components →
        oriented min-rects → unclip, all under jit); the response shrinks
        from two H×W masks to K quad records per image. ``boxes`` are
        (4, 2) corner quads like the reference's client-side rect mode."""
        from ..ops.pallas.cc import device_boxes
        from ..postprocess import finish_device_rects

        prob = data[..., 0]
        height, width = prob.shape[1], prob.shape[2]
        corners, scores, keep = device_boxes(
            prob, thresh=thresh, box_thresh=box_thresh,
            unclip_ratio=unclip_ratio, unclip=False)
        corners, scores, keep = (np.asarray(corners), np.asarray(scores),
                                 np.asarray(keep))
        res = []
        for i in range(corners.shape[0]):
            # host-finish the K kept rects (exact unclip — parity with the
            # host/reference rect geometry)
            boxes, kept_scores = finish_device_rects(
                corners[i][keep[i]], scores[i][keep[i]], width, height,
                width, height, unclip_ratio=unclip_ratio)
            res.append({
                "boxes": [np.asarray(q, float).tolist() for q in boxes],
                "scores": kept_scores.astype(float).tolist(),
            })
        return res

    def handle(self, request: list[dict[str, Any]],
               mode: str = "masks"):
        """``src/db_handler.py:109-120``; ``mode='boxes'`` selects the fast
        on-device box path."""
        if not self.initialized:
            self.initialize()
        if request is None:
            return None
        if mode != "boxes" and getattr(self, "_prob_only", False):
            raise ValueError(
                "this export was built with --prob_only (no thresh map); "
                "masks/masks_png modes need a 2-channel graph — use "
                "mode=boxes or re-export without --prob_only")
        batch = self.preprocess(request)
        if mode == "boxes":
            # prob-only forward when available (folded live path); preds
            # stay on device and only K box records come back
            fwd = self._forward_prob or self._forward
            return self.postprocess_boxes(fwd(batch))
        if mode == "masks_png":
            return self.postprocess_png(self.inference(batch))
        return self.postprocess(self.inference(batch))
