"""Int8 post-training-quantized inference for the flagship detector.

Beyond-reference throughput path (the reference lists quantization as an
unchecked TODO, ``README.md:108-111``): v5e multiplies int8 at 2× the bf16
rate; the heaviest conv measured 1.42× faster in int8
(docs/PERFORMANCE.md). Scheme:

- weights: symmetric per-output-channel int8, quantized once offline
  (``prepare_quant_params``);
- activations: symmetric per-tensor int8 with *dynamic* scales (max computed
  on the fly — no calibration set needed);
- accumulation in int32 (``preferred_element_type``), dequantized into f32
  for BatchNorm/relu, which stay in float.

The forward is a pure-functional re-statement of resnet18 + FPN + DBHead
reading the standard ``DBTextModel`` variables tree — inference only, for
the registered flagship configuration (``src/models.py:8-10``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .layers import resize_bilinear_align_corners, resize_nearest


def _quant_kernel(kernel):
    """HWIO kernel → (int8 kernel, per-output-channel f32 scale)."""
    k = np.asarray(kernel, np.float32)
    amax = np.abs(k).max(axis=(0, 1, 2), keepdims=True)
    scale = np.maximum(amax / 127.0, 1e-12)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale.reshape(-1).astype(np.float32)


DEFAULT_SKIP = ("segmentation_head",)


def prepare_quant_params(variables: dict,
                         skip: tuple = DEFAULT_SKIP) -> dict:
    """Quantize conv kernels in a DBTextModel variables tree (leaves named
    ``kernel`` with ndim 4), adding a sibling ``kernel_scale``. Subtrees
    whose path contains any name in ``skip`` stay float — by default the
    segmentation head, whose precision directly sets box scores (full-model
    quantization measurably hurt precision; see docs/PERFORMANCE.md)."""

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        out = {}
        skipped = any(s in path for s in skip)
        for key, value in node.items():
            if isinstance(value, dict):
                out[key] = walk(value, path + (key,))
            elif (key == "kernel" and np.asarray(value).ndim == 4
                  and not skipped):
                q, s = _quant_kernel(value)
                out["kernel"] = q
                out["kernel_scale"] = s
            else:
                out[key] = value
        return out

    return {"params": walk(variables["params"], ()),
            "batch_stats": variables.get("batch_stats", {})}


_CALIBRATION: list | None = None


def _qconv(x, params, stride=1, pad=1, transpose=False):
    """Quantized conv: int8×int8 → int32, dequantized. The activation scale
    is static when calibrated (``act_scale`` present — no reduction in the
    hot path), dynamic per-tensor otherwise. Deconvs (2×2/2) stay in bf16 —
    tiny FLOPs, and int8 transposed conv lowers poorly."""
    kernel = params["kernel"]
    if transpose or kernel.dtype != jnp.int8:
        k = jnp.asarray(kernel, jnp.bfloat16)
        if transpose:
            y = jax.lax.conv_transpose(
                x.astype(jnp.bfloat16), k, strides=(stride, stride),
                padding="SAME" if pad else "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), k, (stride, stride),
                [(pad, pad), (pad, pad)],
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, k.shape, ("NHWC", "HWIO", "NHWC")))
        y = y.astype(jnp.float32)
    else:
        if _CALIBRATION is not None:
            _CALIBRATION.append(jnp.max(jnp.abs(x)))
        if "act_scale" in params:
            sx = jnp.asarray(params["act_scale"], jnp.float32)
        else:
            sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / 127.0
        qx = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            qx, kernel, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                qx.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * params["kernel_scale"])
    if "bias" in params:
        y = y + jnp.asarray(params["bias"], jnp.float32)
    return y


def calibrate_activation_scales(qvars: dict, sample_batches) -> dict:
    """Bake static per-conv activation scales into a quantized variables
    tree: run the (dynamic) quant forward over calibration batches recording
    each quantized conv's abs-max, then attach ``act_scale = max/127`` to
    every int8 kernel in traversal order (the forward visits convs in a
    deterministic order)."""
    global _CALIBRATION
    maxes = None
    for batch in sample_batches:
        _CALIBRATION = []
        quant_dbnet_forward(qvars, jnp.asarray(batch))
        batch_maxes = np.asarray([float(v) for v in _CALIBRATION])
        _CALIBRATION = None
        maxes = batch_maxes if maxes is None else np.maximum(maxes,
                                                             batch_maxes)
    ordered = _forward_conv_order(qvars["params"])
    assert len(ordered) == len(maxes), (len(ordered), len(maxes))
    for node, scale in zip(ordered, np.maximum(maxes, 1e-6) / 127.0):
        node["act_scale"] = np.float32(scale)
    return qvars


def _forward_conv_order(p: dict) -> list:
    """The int8-conv param dicts in the exact order quant_dbnet_forward
    executes them."""
    order = []
    bp = p["backbone"]
    order.append(bp["conv1"])
    for stage in range(1, 5):
        for block in range(2):
            blk = bp[f"layer{stage}_{block}"]
            order.append(blk["conv1"])
            order.append(blk["conv2"])
            if "downsample_conv" in blk:
                order.append(blk["downsample_conv"])
    np_ = p["segmentation_body"]
    order.append(np_["reduce_conv_c5"]["conv"])
    order.append(np_["reduce_conv_c4"]["conv"])
    order.append(np_["smooth_p4"]["conv"])
    order.append(np_["reduce_conv_c3"]["conv"])
    order.append(np_["smooth_p3"]["conv"])
    order.append(np_["reduce_conv_c2"]["conv"])
    order.append(np_["smooth_p2"]["conv"])
    order.append(np_["conv"])
    # head convs only when quantized (not in DEFAULT_SKIP runs)
    hp = p.get("segmentation_head", {})
    for branch in ("binarize", "thresh"):
        conv1 = hp.get(branch, {}).get("conv1", {})
        if getattr(conv1.get("kernel", None), "dtype", None) == np.int8:
            order.append(conv1)
    return [node for node in order
            if getattr(node.get("kernel", None), "dtype", None) == np.int8]


def _bn(x, params, stats, eps=1e-5):
    inv = jax.lax.rsqrt(jnp.asarray(stats["var"], jnp.float32) + eps)
    return ((x - stats["mean"]) * inv * params["scale"] + params["bias"])


def _bn_relu(x, params, stats):
    return jax.nn.relu(_bn(x, params, stats))


def _basic_block(x, p, s, stride):
    residual = x
    out = _qconv(x, p["conv1"], stride=stride)
    out = _bn_relu(out, p["bn1"], s["bn1"])
    out = _qconv(out, p["conv2"])
    out = _bn(out, p["bn2"], s["bn2"])
    if "downsample_conv" in p:
        residual = _qconv(x, p["downsample_conv"], stride=stride, pad=0)
        residual = _bn(residual, p["downsample_bn"], s["downsample_bn"])
    return jax.nn.relu(out + residual)


def quant_dbnet_forward(qvars: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Eval-mode forward: (N, H, W, 3) f32 → (N, H, W, 2) maps in [0, 1]."""
    p, s = qvars["params"], qvars["batch_stats"]
    bp, bs = p["backbone"], s["backbone"]

    h = _qconv(x, bp["conv1"], stride=2, pad=3)
    h = _bn_relu(h, bp["bn1"], bs["bn1"])
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    feats = []
    for stage in range(1, 5):
        stride = 1 if stage == 1 else 2
        for block in range(2):
            name = f"layer{stage}_{block}"
            h = _basic_block(h, bp[name], bs[name],
                             stride if block == 0 else 1)
        feats.append(h)
    c2, c3, c4, c5 = feats

    np_, ns = p["segmentation_body"], s["segmentation_body"]

    def reduce_conv(c, name):
        y = _qconv(c, np_[name]["conv"], pad=0)
        return _bn_relu(y, np_[name]["bn"], ns[name]["bn"])

    def smooth(y, name):
        y = _qconv(y, np_[name]["conv"])
        return _bn_relu(y, np_[name]["bn"], ns[name]["bn"])

    p5 = reduce_conv(c5, "reduce_conv_c5")
    p4 = smooth(resize_nearest(p5, c4.shape[1:3])
                + reduce_conv(c4, "reduce_conv_c4"), "smooth_p4")
    p3 = smooth(resize_nearest(p4, c3.shape[1:3])
                + reduce_conv(c3, "reduce_conv_c3"), "smooth_p3")
    p2 = smooth(resize_nearest(p3, c2.shape[1:3])
                + reduce_conv(c2, "reduce_conv_c2"), "smooth_p2")
    size = p2.shape[1:3]
    body = jnp.concatenate([p2, resize_nearest(p3, size),
                            resize_nearest(p4, size),
                            resize_nearest(p5, size)], axis=-1)
    body = _qconv(body, np_["conv"])
    body = _bn_relu(body, np_["conv_bn"], ns["conv_bn"])

    hp, hs = p["segmentation_head"], s["segmentation_head"]

    def branch(z, bpz, bsz):
        z = _qconv(z, bpz["conv1"])
        z = _bn_relu(z, bpz["bn1"], bsz["bn1"])
        z = _qconv(z, bpz["deconv1"], stride=2, transpose=True)
        z = _bn_relu(z, bpz["bn2"], bsz["bn2"])
        z = _qconv(z, bpz["deconv2"], stride=2, transpose=True)
        return jax.nn.sigmoid(z)

    shrink = branch(body, hp["binarize"], hs["binarize"])
    thresh = branch(body, hp["thresh"], hs["thresh"])
    y = jnp.concatenate([shrink, thresh], axis=-1)
    return resize_bilinear_align_corners(y, x.shape[1:3])
