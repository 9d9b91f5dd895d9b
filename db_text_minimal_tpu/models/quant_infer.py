"""Int8 post-training-quantized inference for the flagship detector.

Beyond-reference throughput path (the reference lists quantization as an
unchecked TODO, ``README.md:108-111``): v5e multiplies int8 at 2× the bf16
rate; the heaviest conv measures 1.51× faster in int8 with the full
dequant→BN→relu→requant epilogue left to XLA's fusion (docs/PERFORMANCE.md
round-2 probe — a hand-written Pallas epilogue kernel is SLOWER because it
breaks XLA's conv fusion). Scheme:

- BatchNorm is folded into every conv/deconv offline (γ/σ into the kernel's
  output channels, β−μγ/σ into the bias) — inference runs zero BN ops;
- weights: symmetric per-output-channel int8, but ONLY for convs where both
  dims fill the MXU/lane tiling (Cout ≥ 128, Cin ≥ 64 — the int8 (32, 128)
  tile makes narrow convs slower, not faster): resnet18 layers 2-4 and the
  dominant FPN 1024→256 output conv. Narrow convs (stem, layer1, FPN
  64-channel reduce/smooth, head) stay bf16;
- activations: symmetric per-tensor int8, static calibrated scales
  (``calibrate_activation_scales``) or dynamic abs-max fallback;
- accumulation in int32 (``preferred_element_type``), dequantized into the
  f32 epilogue XLA fuses into the surrounding elementwise work.

The forward is a pure-functional re-statement of resnet18 + FPN +
FusedDBHead reading a FOLDED variables tree built by ``prepare_quant_params``
from standard ``DBTextModel`` variables (run ``head.fuse_variables`` first —
the quant path uses the fused inference head). Inference only, for the
registered flagship configuration (``src/models.py:8-10``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .layers import resize_bilinear_align_corners, resize_nearest

DEFAULT_SKIP = ("segmentation_head",)


def _compute_dtype():
    """bf16 on accelerators; f32 on CPU, where bf16 is slow software
    emulation (matches ``DBTextModel``'s backend-dependent dtype policy)."""
    return (jnp.bfloat16 if jax.default_backend() not in ("cpu",)
            else jnp.float32)


# ---------------------------------------------------------------------------
# Offline preparation: BN folding + selective int8 quantization
# ---------------------------------------------------------------------------

def _fold(conv: dict, bn_p: dict | None = None, bn_s: dict | None = None,
          eps: float = 1e-5) -> dict:
    """Fold BatchNorm into a conv/deconv node → {kernel f32, bias f32}.
    Works for HWIO conv kernels and (kh, kw, in, out) deconv kernels — the
    output-channel axis is last in both."""
    k = np.asarray(conv["kernel"], np.float32)
    b = np.asarray(conv.get("bias", np.zeros(k.shape[-1])), np.float32)
    if bn_p is not None:
        inv = np.float32(1.0) / np.sqrt(
            np.asarray(bn_s["var"], np.float32) + eps)
        g = np.asarray(bn_p["scale"], np.float32) * inv
        k = k * g
        b = (b - np.asarray(bn_s["mean"], np.float32)) * g \
            + np.asarray(bn_p["bias"], np.float32)
    return {"kernel": k, "bias": b}


def _quantize(node: dict) -> dict:
    """Per-output-channel symmetric int8 quantization of a folded conv."""
    k = node["kernel"]
    amax = np.abs(k).max(axis=(0, 1, 2), keepdims=True)
    scale = np.maximum(amax / 127.0, 1e-12)
    return {"kernel": np.clip(np.round(k / scale), -127,
                              127).astype(np.int8),
            "eff_scale": scale.reshape(-1).astype(np.float32),
            "bias": node["bias"]}


def _s2d_stem_kernel(k7: np.ndarray) -> np.ndarray:
    """Rewrite the stem's 7×7/s2 kernel (kh, kw, 3, 64) into the exact
    weight-equivalent 4×4/s1 kernel over a 2×2 space-to-depth input
    (kh', kw', 12, 64).

    The 3-channel 640² input leaves the MXU/lane tiling mostly empty; after
    space-to-depth the same conv runs on a 320²×12 tensor. Derivation: pad
    the 7×7 kernel to 8×8 with a leading zero row/col (tap offset −4), then
    fold each 2×2 spatial block into channels in (dy, dx, c) order — the
    order ``_space_to_depth`` produces. Output positions/values are
    bit-for-bit the taps of the original stride-2 conv with pad 3; the
    equivalent conv uses stride 1 with asymmetric pad (2, 1)."""
    kh, kw, cin, cout = k7.shape
    k8 = np.zeros((kh + 1, kw + 1, cin, cout), k7.dtype)
    k8[1:, 1:] = k7
    k4 = k8.reshape((kh + 1) // 2, 2, (kw + 1) // 2, 2, cin, cout)
    k4 = k4.transpose(0, 2, 1, 3, 4, 5)
    return k4.reshape((kh + 1) // 2, (kw + 1) // 2, 4 * cin, cout)


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) → (N, H/2, W/2, 4C), channel order (dy, dx, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 4C) with channel order (dy, dx, c) → (N, 2H, 2W, C) —
    the inverse of ``_space_to_depth``."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, c)


def _d2s_deconv_kernel(k: np.ndarray) -> np.ndarray:
    """Rewrite a 2×2/s2 transposed-conv kernel (2, 2, cin, cout) into the
    exact weight-equivalent 1×1 kernel (1, 1, cin, 4·cout) for a 1×1 conv
    followed by ``_depth_to_space``.

    A k=2 s=2 transposed conv writes each input pixel to a disjoint 2×2
    output block: ``y[2i+dy, 2j+dx, o] = Σ_c x[i, j, c] · k[1-dy, 1-dx, c, o]``
    (``jax.lax.conv_transpose`` applies the kernel spatially flipped —
    verified by delta probe) — i.e. a pure per-pixel matmul to (dy, dx, o)
    channels.

    MEASURED NEGATIVE on v5e (kept as an option, off by default): the
    theory was that the input-dilated lowering wastes 3/4 of its MACs, but
    the 1×1+depth-to-space form benches 13 % SLOWER end to end (722.6 vs
    830.8 img/s, demo/hard_bench/infer_modes.json) — XLA's deconv lowering
    is already efficient here, and the explicit reshape/transpose shuffle
    costs extra HBM round-trips at the largest spatial maps. Same lesson
    as the Pallas epilogue kernel: don't hand-schedule what the compiler
    already fuses."""
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (2, 2), k.shape
    return k[::-1, ::-1].transpose(2, 0, 1, 3).reshape(1, 1, cin, 4 * cout)


def prepare_quant_params(variables: dict, skip: tuple = DEFAULT_SKIP,
                         min_out_channels: int = 128,
                         min_in_channels: int = 64,
                         stem_s2d: bool = False,
                         deconv_d2s: bool = False) -> dict:
    """Standard ``DBTextModel`` variables (FusedDBHead layout — run
    ``head.fuse_variables`` on a trained DBHead model first) → folded +
    selectively-quantized inference tree for ``quant_dbnet_forward``.

    Subtrees whose path contains a name in ``skip`` stay bf16 (default: the
    segmentation head, whose precision directly sets box scores).
    ``stem_s2d`` rewrites the stem conv into its space-to-depth form
    (``_s2d_stem_kernel``); ``deconv_d2s`` rewrites the head's 2×2/s2
    transposed convs into 1×1 conv + depth-to-space
    (``_d2s_deconv_kernel``). Both are weight-exact; the forward detects
    the rewritten kernel shapes."""
    p = jax.device_get(variables["params"])
    s = jax.device_get(variables.get("batch_stats", {}))

    def maybe_quant(node, path):
        k = node["kernel"]
        if (any(name in path for name in skip) or k.ndim != 4
                or k.shape[-1] < min_out_channels
                or k.shape[-2] < min_in_channels):
            return node
        return _quantize(node)

    out: dict = {"backbone": {}, "segmentation_body": {},
                 "segmentation_head": {}}
    bp, bs = p["backbone"], s["backbone"]
    ob = out["backbone"]
    stem = _fold(bp["conv1"], bp["bn1"], bs["bn1"])
    if stem_s2d:
        stem["kernel"] = _s2d_stem_kernel(stem["kernel"])
    ob["conv1"] = maybe_quant(stem, ("backbone", "conv1"))
    for name in sorted(k for k in bp if k.startswith("layer")):
        blk, bst = bp[name], bs[name]
        node = {
            "conv1": maybe_quant(_fold(blk["conv1"], blk["bn1"],
                                       bst["bn1"]), ("backbone", name)),
            "conv2": maybe_quant(_fold(blk["conv2"], blk["bn2"],
                                       bst["bn2"]), ("backbone", name)),
        }
        if "downsample_conv" in blk:
            node["downsample_conv"] = maybe_quant(
                _fold(blk["downsample_conv"], blk["downsample_bn"],
                      bst["downsample_bn"]), ("backbone", name))
        ob[name] = node
    np_, ns = p["segmentation_body"], s["segmentation_body"]
    onk = out["segmentation_body"]
    for name in ("reduce_conv_c5", "reduce_conv_c4", "reduce_conv_c3",
                 "reduce_conv_c2", "smooth_p4", "smooth_p3", "smooth_p2"):
        onk[name] = maybe_quant(
            _fold(np_[name]["conv"], np_[name]["bn"], ns[name]["bn"]),
            ("segmentation_body", name))
    onk["conv"] = maybe_quant(_fold(np_["conv"], np_["conv_bn"],
                                    ns["conv_bn"]),
                              ("segmentation_body", "conv"))
    hp, hs = p["segmentation_head"], s["segmentation_head"]
    assert "conv1" in hp and "binarize_deconv1" in hp, \
        "quant path expects the FusedDBHead layout (head.fuse_variables)"
    oh = out["segmentation_head"]
    oh["conv1"] = maybe_quant(_fold(hp["conv1"], hp["bn1"], hs["bn1"]),
                              ("segmentation_head", "conv1"))
    for branch in ("binarize", "thresh"):
        d1 = _fold(hp[f"{branch}_deconv1"], hp[f"{branch}_bn2"],
                   hs[f"{branch}_bn2"])
        d2 = _fold(hp[f"{branch}_deconv2"])
        if deconv_d2s:
            d1["kernel"] = _d2s_deconv_kernel(d1["kernel"])
            d2["kernel"] = _d2s_deconv_kernel(d2["kernel"])
        oh[f"{branch}_deconv1"] = d1
        oh[f"{branch}_deconv2"] = d2
    return {"params": out}


# ---------------------------------------------------------------------------
# Folded forward
# ---------------------------------------------------------------------------

_CALIBRATION: list | None = None


def _fconv(x, node, stride=1, pad=1, relu=False):
    """Folded conv: int8×int8→int32 when quantized (static ``act_scale``
    if calibrated, dynamic abs-max otherwise), bf16 otherwise; bias and
    optional relu in the f32 epilogue XLA fuses. ``pad`` is a symmetric
    int or an explicit ((lo, hi), (lo, hi))."""
    kernel = node["kernel"]
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    if kernel.dtype == jnp.int8:
        if _CALIBRATION is not None:
            _CALIBRATION.append(jnp.max(jnp.abs(x)))
        if "act_scale" in node:
            sx = jnp.asarray(node["act_scale"], jnp.float32)
        else:
            sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / 127.0
        qx = jnp.clip(jnp.round(x * (1.0 / sx)), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            qx, kernel, (stride, stride), pad,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                qx.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * node["eff_scale"]) + node["bias"]
    else:
        ct = _compute_dtype()
        k = jnp.asarray(kernel, ct)
        y = jax.lax.conv_general_dilated(
            x.astype(ct), k, (stride, stride), pad,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC")))
        y = y.astype(jnp.float32) + node["bias"]
    return jax.nn.relu(y) if relu else y


def _fdeconv(x, node, relu=False):
    """Folded 2×2/2 transposed conv — bf16 (int8 transposed conv lowers
    poorly). A (1, 1, cin, 4·cout) kernel selects the weight-exact
    1×1-conv + depth-to-space form (``_d2s_deconv_kernel``): a dense MXU
    matmul instead of the input-dilated conv XLA lowers ``conv_transpose``
    to (which wastes 3/4 of its MACs on structural zeros)."""
    ct = _compute_dtype()
    k = jnp.asarray(node["kernel"], ct)
    if k.shape[0] == 1:
        y = jax.lax.conv_general_dilated(
            x.astype(ct), k, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC")))
        y = _depth_to_space(y).astype(jnp.float32) + node["bias"]
    else:
        y = jax.lax.conv_transpose(
            x.astype(ct), k, strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.astype(jnp.float32) + node["bias"]
    return jax.nn.relu(y) if relu else y


def _basic_block(x, p, stride):
    out = _fconv(x, p["conv1"], stride=stride, relu=True)
    out = _fconv(out, p["conv2"])
    if "downsample_conv" in p:
        x = _fconv(x, p["downsample_conv"], stride=stride, pad=0)
    return jax.nn.relu(out + x)


def quant_dbnet_forward(qvars: dict, x: jnp.ndarray,
                        prob_only: bool = False) -> jnp.ndarray:
    """Eval-mode forward: (N, H, W, 3) f32 → (N, H, W, 2) maps in [0, 1].

    ``prob_only`` skips the threshold branch entirely and returns
    (N, H, W, 1) — box/polygon postprocess reads only the prob map
    (reference ``src/postprocess.py:33``), so detection-serving and offline
    eval don't pay for the unused thresh tail (2 deconvs + sigmoid at
    full resolution)."""
    p = qvars["params"]
    bp = p["backbone"]

    stem = bp["conv1"]
    if stem["kernel"].shape[0] == 4:  # space-to-depth stem (stem_s2d)
        h = _fconv(_space_to_depth(x), stem, stride=1,
                   pad=((2, 1), (2, 1)), relu=True)
    else:
        h = _fconv(x, stem, stride=2, pad=3, relu=True)
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    feats = []
    for stage in range(1, 5):
        stride = 1 if stage == 1 else 2
        for block in range(2):
            h = _basic_block(h, bp[f"layer{stage}_{block}"],
                             stride if block == 0 else 1)
        feats.append(h)
    c2, c3, c4, c5 = feats

    np_ = p["segmentation_body"]
    p5 = _fconv(c5, np_["reduce_conv_c5"], pad=0, relu=True)
    p4 = _fconv(resize_nearest(p5, c4.shape[1:3])
                + _fconv(c4, np_["reduce_conv_c4"], pad=0, relu=True),
                np_["smooth_p4"], relu=True)
    p3 = _fconv(resize_nearest(p4, c3.shape[1:3])
                + _fconv(c3, np_["reduce_conv_c3"], pad=0, relu=True),
                np_["smooth_p3"], relu=True)
    p2 = _fconv(resize_nearest(p3, c2.shape[1:3])
                + _fconv(c2, np_["reduce_conv_c2"], pad=0, relu=True),
                np_["smooth_p2"], relu=True)
    size = p2.shape[1:3]
    body = jnp.concatenate([p2, resize_nearest(p3, size),
                            resize_nearest(p4, size),
                            resize_nearest(p5, size)], axis=-1)
    body = _fconv(body, np_["conv"], relu=True)

    hp = p["segmentation_head"]
    h1 = _fconv(body, hp["conv1"], relu=True)
    half = h1.shape[-1] // 2

    def tail(z, branch):
        z = _fdeconv(z, hp[f"{branch}_deconv1"], relu=True)
        z = _fdeconv(z, hp[f"{branch}_deconv2"])
        return jax.nn.sigmoid(z)

    shrink = tail(h1[..., :half], "binarize")
    if prob_only:
        return resize_bilinear_align_corners(shrink, x.shape[1:3])
    thresh = tail(h1[..., half:], "thresh")
    y = jnp.concatenate([shrink, thresh], axis=-1)
    return resize_bilinear_align_corners(y, x.shape[1:3])


# ---------------------------------------------------------------------------
# Static activation-scale calibration
# ---------------------------------------------------------------------------

def _forward_conv_order(p: dict) -> list:
    """The int8-conv nodes in the exact order quant_dbnet_forward executes
    them."""
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
    order += [np_["reduce_conv_c5"], np_["reduce_conv_c4"],
              np_["smooth_p4"], np_["reduce_conv_c3"], np_["smooth_p3"],
              np_["reduce_conv_c2"], np_["smooth_p2"], np_["conv"]]
    order.append(p["segmentation_head"]["conv1"])
    return [n for n in order
            if getattr(n.get("kernel", None), "dtype", None) == np.int8]


def calibrate_activation_scales(qvars: dict, sample_batches) -> dict:
    """Bake static per-conv activation scales into a quantized variables
    tree: run the (dynamic) quant forward over calibration batches recording
    each quantized conv's input abs-max, then attach ``act_scale = max/127``
    to every int8 conv in traversal order (the forward visits convs in a
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
