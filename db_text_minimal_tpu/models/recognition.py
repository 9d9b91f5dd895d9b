"""Scene-text recognition model: the four-stage framework consumed by the
reference's OCR pipeline, rebuilt in-tree in Flax.

The reference imports this capability from the out-of-tree ``clova_ocr``
package (``src/test_ocr.py:23-25``; stage choices at ``:267-282``:
Transformation None|TPS, FeatureExtraction VGG|RCNN|ResNet, SequenceModeling
None|BiLSTM, Prediction CTC|Attn). SURVEY.md §1 requires an in-tree
recognition model to match the full-OCR capability. Architectures follow the
well-known CRNN / "what is wrong in STR" four-stage design, implemented
TPU-first: NHWC convs, ``lax.scan`` LSTMs, static decode length
(``batch_max_length``), greedy decode fully on device.

Inputs are (N, 32, 100, 1) grayscale crops normalized to [-1, 1]
(``rec_preprocess``); outputs are logits (N, T, num_class).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Dtype, he_normal_torch


# ---------------------------------------------------------------------------
# Stage 1: Transformation (TPS spatial transformer)
# ---------------------------------------------------------------------------

class LocalizationNetwork(nn.Module):
    """Predicts F fiducial points from the input crop."""

    num_fiducial: int = 20
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate((64, 128, 256, 512)):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=he_normal_torch(), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
            if i < 3:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.relu(nn.Dense(256, name="fc1")(x.astype(jnp.float32)))
        # final fc initialised to output the identity fiducial grid
        f = self.num_fiducial
        ctrl = _base_fiducials(f)
        fc2 = nn.Dense(
            f * 2, kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.asarray(ctrl.reshape(-1), jnp.float32),
            name="fc2")
        return fc2(x).reshape(-1, f, 2)


def _base_fiducials(f: int) -> np.ndarray:
    """F control points on the top/bottom edges in [-1, 1] coords."""
    half = f // 2
    x = np.linspace(-1.0, 1.0, half)
    top = np.stack([x, -np.ones(half)], axis=1)
    bottom = np.stack([x, np.ones(half)], axis=1)
    return np.concatenate([top, bottom], axis=0)  # (F, 2)


def _tps_inverse_delta(ctrl: np.ndarray) -> np.ndarray:
    f = ctrl.shape[0]
    d2 = ((ctrl[:, None, :] - ctrl[None, :, :]) ** 2).sum(-1)
    u = d2 * np.log(d2 + np.eye(f))  # U(r) = r^2 log r^2; diag zero
    delta = np.zeros((f + 3, f + 3))
    delta[:f, 0] = 1.0
    delta[:f, 1:3] = ctrl
    delta[:f, 3:] = u
    delta[f, 3:] = 1.0
    delta[f + 1:, 3:] = ctrl.T
    return np.linalg.inv(delta)


def _tps_phat(points: np.ndarray, ctrl: np.ndarray) -> np.ndarray:
    n = points.shape[0]
    d2 = ((points[:, None, :] - ctrl[None, :, :]) ** 2).sum(-1)
    rbf = d2 * np.log(d2 + 1e-9)
    return np.concatenate([np.ones((n, 1)), points, rbf], axis=1)


class TPSTransformation(nn.Module):
    """TPS spatial transformer: rectifies curved text to an axis-aligned
    crop. Grid solve uses precomputed (static) inverse-delta and P-hat
    matrices; the per-image work is one (F+3)×2 matmul + bilinear gather."""

    num_fiducial: int = 20
    out_size: tuple = (32, 100)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.num_fiducial
        ctrl = _base_fiducials(f)
        inv_delta = jnp.asarray(_tps_inverse_delta(ctrl), jnp.float32)
        oh, ow = self.out_size
        ys, xs = np.meshgrid(np.linspace(-1, 1, oh), np.linspace(-1, 1, ow),
                             indexing="ij")
        grid = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=1)
        phat = jnp.asarray(_tps_phat(grid, ctrl), jnp.float32)  # (HW, F+3)

        c_prime = LocalizationNetwork(f, dtype=self.dtype,
                                      name="localization")(x, train=train)
        zeros = jnp.zeros((c_prime.shape[0], 3, 2), jnp.float32)
        rhs = jnp.concatenate([c_prime, zeros], axis=1)      # (N, F+3, 2)
        t = jnp.einsum("ij,njk->nik", inv_delta, rhs)        # (N, F+3, 2)
        sample = jnp.einsum("pi,nik->npk", phat, t)          # (N, HW, 2)
        sample = sample.reshape(-1, oh, ow, 2)
        return _grid_sample(x, sample)


def _grid_sample(img, grid):
    """Bilinear sampling of NHWC ``img`` at normalized [-1, 1] (x, y)."""
    n, h, w, c = img.shape
    gx = (grid[..., 0] + 1.0) * (w - 1) / 2.0
    gy = (grid[..., 1] + 1.0) * (h - 1) / 2.0
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]

    def gather(yy, xx):
        valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        flat = img.reshape(n, h * w, c)
        idx = (yc * w + xc).reshape(n, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        return jnp.where(valid, vals.reshape(*yy.shape, c), 0.0)

    top = gather(y0, x0) * (1 - wx) + gather(y0, x0 + 1) * wx
    bot = gather(y0 + 1, x0) * (1 - wx) + gather(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# Stage 2: Feature extraction (VGG / RCNN / ResNet) → (N, W/4+1, C)
# ---------------------------------------------------------------------------

def _conv_bn_relu(x, ch, train, name, kernel=3, stride=(1, 1), pad=1,
                  dtype=jnp.float32):
    x = nn.Conv(ch, (kernel, kernel), strides=stride,
                padding=[(pad, pad), (pad, pad)], use_bias=False,
                kernel_init=he_normal_torch(), dtype=dtype,
                name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                     epsilon=1e-5, dtype=jnp.float32, name=f"{name}_bn")(x)
    return nn.relu(x)


class VGGExtractor(nn.Module):
    """CRNN-style VGG: (N, 32, 100, 1) → (N, 1, 26, C)."""

    output_channel: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.output_channel
        chans = (oc // 8, oc // 4, oc // 2, oc)  # 64,128,256,512
        x = _conv_bn_relu(x, chans[0], train, "l0", dtype=self.dtype)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                  # 16x50
        x = _conv_bn_relu(x, chans[1], train, "l1", dtype=self.dtype)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                  # 8x25
        x = _conv_bn_relu(x, chans[2], train, "l2", dtype=self.dtype)
        x = _conv_bn_relu(x, chans[2], train, "l3", dtype=self.dtype)
        x = nn.max_pool(x, (2, 1), strides=(2, 1))                   # 4x25
        x = _conv_bn_relu(x, chans[3], train, "l4", dtype=self.dtype)
        x = _conv_bn_relu(x, chans[3], train, "l5", dtype=self.dtype)
        x = nn.max_pool(x, (2, 1), strides=(2, 1))                   # 2x25
        x = _conv_bn_relu(x, chans[3], train, "l6", kernel=2, stride=(1, 1),
                          pad=0, dtype=self.dtype)                   # 1x24
        return x


class GRCL(nn.Module):
    """Gated recurrent conv layer (RCNN extractor building block)."""

    channels: int
    iterations: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        wgf = nn.Conv(self.channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="wgf")
        wgr = nn.Conv(self.channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="wgr")
        wf = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                     use_bias=False, dtype=self.dtype, name="wf")
        wr = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                     use_bias=False, dtype=self.dtype, name="wr")
        wgf_x = wgf(x)
        wf_x = wf(x)
        h = nn.relu(bn("bn_f")(wf_x))
        for it in range(self.iterations):
            gate = nn.sigmoid(bn(f"bn_gf_{it}")(wgf_x)
                              + bn(f"bn_gr_{it}")(wgr(h)))
            h = nn.relu(bn(f"bn_x_{it}")(wf_x)
                        + bn(f"bn_h_{it}")(wr(h)) * gate)
        return h


class RCNNExtractor(nn.Module):
    """GRCL-based extractor → (N, 1, 26, C)."""

    output_channel: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.output_channel
        x = _conv_bn_relu(x, oc // 8, train, "stem", dtype=self.dtype)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                  # 16x50
        x = GRCL(oc // 8, dtype=self.dtype, name="grcl1")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                  # 8x25
        x = GRCL(oc // 4, dtype=self.dtype, name="grcl2")(
            _conv_bn_relu(x, oc // 4, train, "up2", kernel=1, pad=0,
                          dtype=self.dtype), train)
        x = nn.max_pool(x, (2, 2), strides=(2, 1),
                        padding=[(0, 0), (1, 1)])                    # 4x26
        x = GRCL(oc // 2, dtype=self.dtype, name="grcl3")(
            _conv_bn_relu(x, oc // 2, train, "up3", kernel=1, pad=0,
                          dtype=self.dtype), train)
        x = nn.max_pool(x, (2, 2), strides=(2, 1),
                        padding=[(0, 0), (1, 1)])                    # 2x27
        x = _conv_bn_relu(x, oc, train, "head", kernel=2, stride=(2, 1),
                          pad=0, dtype=self.dtype)                   # 1x26
        return x


class _RecBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv_bn_relu(x, self.planes, train, "c1", dtype=self.dtype)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, dtype=self.dtype, name="c2_conv")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           name="c2_bn")(out)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), use_bias=False,
                               dtype=self.dtype, name="down_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32,
                                    name="down_bn")(residual)
        return nn.relu(out + residual)


class ResNetExtractor(nn.Module):
    """clova-style recognition ResNet → (N, 1, 26, C)."""

    output_channel: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.output_channel
        x = _conv_bn_relu(x, oc // 16, train, "c0_1", dtype=self.dtype)
        x = _conv_bn_relu(x, oc // 8, train, "c0_2", dtype=self.dtype)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                   # 16x50
        for i in range(1):
            x = _RecBasicBlock(oc // 4, downsample=True, dtype=self.dtype,
                               name=f"b1_{i}")(x, train)
        x = _conv_bn_relu(x, oc // 4, train, "c1", dtype=self.dtype)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                   # 8x25
        for i in range(2):
            x = _RecBasicBlock(oc // 2, downsample=(i == 0),
                               dtype=self.dtype, name=f"b2_{i}")(x, train)
        x = _conv_bn_relu(x, oc // 2, train, "c2", dtype=self.dtype)
        x = nn.max_pool(x, (2, 2), strides=(2, 1),
                        padding=[(0, 0), (1, 1)])                    # 4x26
        for i in range(5):
            x = _RecBasicBlock(oc, downsample=(i == 0), dtype=self.dtype,
                               name=f"b3_{i}")(x, train)
        x = _conv_bn_relu(x, oc, train, "c3", dtype=self.dtype)
        for i in range(3):
            x = _RecBasicBlock(oc, downsample=(i == 0), dtype=self.dtype,
                               name=f"b4_{i}")(x, train)
        x = _conv_bn_relu(x, oc, train, "c4_1", kernel=2, stride=(2, 1),
                          pad=0, dtype=self.dtype)                   # 2x26
        x = _conv_bn_relu(x, oc, train, "c4_2", kernel=2, stride=(2, 1),
                          pad=0, dtype=self.dtype)                   # 1x25
        return x


EXTRACTORS = {"VGG": VGGExtractor, "RCNN": RCNNExtractor,
              "ResNet": ResNetExtractor}


# ---------------------------------------------------------------------------
# Stage 3: Sequence modeling (BiLSTM)
# ---------------------------------------------------------------------------

class BidirectionalLSTM(nn.Module):
    hidden_size: int
    out_size: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size), reverse=True,
                     keep_order=True, name="bwd")
        h = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
        return nn.Dense(self.out_size, name="proj")(h)


# ---------------------------------------------------------------------------
# Stage 4: Prediction (CTC / attention decoder)
# ---------------------------------------------------------------------------

class AttentionDecoder(nn.Module):
    """Bahdanau-style LSTM attention decoder with on-device greedy decode
    (``lax.scan`` over ``num_steps``; the reference decodes greedily too,
    ``src/test_ocr.py:84-91``)."""

    hidden_size: int
    num_class: int

    @nn.compact
    def __call__(self, enc, text=None, num_steps: int = 26,
                 train: bool = False):
        n = enc.shape[0]
        cell = nn.OptimizedLSTMCell(self.hidden_size, name="rnn")
        i2h = nn.Dense(self.hidden_size, use_bias=False, name="i2h")
        h2h = nn.Dense(self.hidden_size, name="h2h")
        score = nn.Dense(1, use_bias=False, name="score")
        generator = nn.Dense(self.num_class, name="generator")

        enc_proj = i2h(enc)  # (N, T, H)

        def step(carry, token):
            (h, c) = carry
            e = score(jnp.tanh(enc_proj + h2h(h)[:, None, :]))  # (N, T, 1)
            alpha = jax.nn.softmax(e, axis=1)
            context = jnp.sum(alpha * enc, axis=1)              # (N, C)
            onehot = jax.nn.one_hot(token, self.num_class)
            (h, c), _ = cell((h, c), jnp.concatenate([context, onehot], -1))
            logits = generator(h)
            next_token = jnp.argmax(logits, axis=-1)
            return (h, c), (logits, next_token)

        h0 = jnp.zeros((n, self.hidden_size), enc.dtype)
        carry = (h0, h0)
        # unrolled decode loop: flax submodules cannot be closed over by a
        # raw lax.scan; num_steps is small (batch_max_length+1 = 26) and the
        # per-step compute is tiny, so unrolling is cheap for XLA
        all_logits = []
        if train and text is not None:
            for t in range(num_steps):  # teacher forcing
                carry, (logits, _) = step(carry, text[:, t])
                all_logits.append(logits)
        else:
            token = jnp.zeros((n,), jnp.int32)  # [GO]
            for _ in range(num_steps):  # greedy decode
                carry, (logits, token) = step(carry, token)
                all_logits.append(logits)
        return jnp.stack(all_logits, axis=1)


# ---------------------------------------------------------------------------
# Four-stage model
# ---------------------------------------------------------------------------

class RecognitionModel(nn.Module):
    """clova ``Model(opt)`` equivalent (consumed at
    ``src/test_ocr.py:40-48``)."""

    num_class: int
    transformation: str = "None"        # None | TPS
    feature_extraction: str = "ResNet"  # VGG | RCNN | ResNet
    sequence_modeling: str = "BiLSTM"   # None | BiLSTM
    prediction: str = "Attn"            # CTC | Attn
    hidden_size: int = 256
    output_channel: int = 512
    num_fiducial: int = 20
    batch_max_length: int = 25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, text=None, train: bool = False):
        if self.transformation == "TPS":
            x = TPSTransformation(self.num_fiducial,
                                  out_size=x.shape[1:3], dtype=self.dtype,
                                  name="transformation")(x, train=train)
        feat = EXTRACTORS[self.feature_extraction](
            output_channel=self.output_channel, dtype=self.dtype,
            name="feature_extraction")(x, train=train)
        # (N, 1, W', C) -> (N, W', C), adaptive pool over height
        feat = jnp.mean(feat, axis=1).astype(jnp.float32)

        if self.sequence_modeling == "BiLSTM":
            feat = BidirectionalLSTM(self.hidden_size, self.hidden_size,
                                     name="seq1")(feat)
            feat = BidirectionalLSTM(self.hidden_size, self.hidden_size,
                                     name="seq2")(feat)

        if self.prediction == "CTC":
            return nn.Dense(self.num_class, name="prediction")(feat)
        return AttentionDecoder(self.hidden_size, self.num_class,
                                name="prediction")(
            feat, text=text, num_steps=self.batch_max_length + 1,
            train=train)


# ---------------------------------------------------------------------------
# Label converters + preprocessing (clova_ocr.utils / dataset equivalents)
# ---------------------------------------------------------------------------

class CTCLabelConverter:
    """blank at index 0; characters from index 1."""

    def __init__(self, character: str):
        self.character = ["[CTCblank]"] + list(character)
        self.dict = {c: i + 1 for i, c in enumerate(character)}

    def encode(self, texts, batch_max_length: int = 25):
        lengths = [len(t) for t in texts]
        out = np.zeros((len(texts), batch_max_length), np.int32)
        for i, t in enumerate(texts):
            out[i, :len(t)] = [self.dict[c] for c in t]
        return out, np.array(lengths, np.int32)

    def decode(self, indices, lengths):
        texts = []
        index = 0
        for length in lengths:
            t = indices[index:index + length]
            chars = []
            for i in range(length):
                if t[i] != 0 and (not (i > 0 and t[i - 1] == t[i])):
                    chars.append(self.character[t[i]])
            texts.append("".join(chars))
            index += length
        return texts


class AttnLabelConverter:
    """[GO] at 0, [s] (EOS) at 1; characters from index 2."""

    def __init__(self, character: str):
        self.character = ["[GO]", "[s]"] + list(character)
        self.dict = {c: i for i, c in enumerate(self.character)}

    def encode(self, texts, batch_max_length: int = 25):
        out = np.zeros((len(texts), batch_max_length + 2), np.int32)
        lengths = []
        for i, t in enumerate(texts):
            tokens = [self.dict[c] for c in t] + [self.dict["[s]"]]
            lengths.append(len(tokens))
            out[i, 1:1 + len(tokens)] = tokens  # position 0 = [GO]
        return out, np.array(lengths, np.int32)

    def decode(self, indices, lengths):
        return ["".join(self.character[i] for i in row[:length])
                for row, length in zip(np.asarray(indices), lengths)]


def rec_preprocess(img: np.ndarray, img_h: int = 32, img_w: int = 100,
                   pad: bool = False) -> np.ndarray:
    """clova ``dataset.test_preprocess`` equivalent (consumed at
    ``src/test_ocr.py:200``): grayscale, resize to (img_h, img_w)
    (aspect-preserving right-pad when ``pad``), normalize to [-1, 1],
    NHWC (N, H, W, 1)."""
    import cv2

    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    if pad:
        h, w = img.shape
        ratio = w / float(h)
        resized_w = min(img_w, max(1, int(np.ceil(img_h * ratio))))
        resized = cv2.resize(img, (resized_w, img_h))
        canvas = np.zeros((img_h, img_w), resized.dtype)
        canvas[:, :resized_w] = resized
        if resized_w < img_w:  # replicate right edge (clova NormalizePAD)
            canvas[:, resized_w:] = resized[:, -1:]
        img = canvas
    else:
        img = cv2.resize(img, (img_w, img_h))
    img = img.astype(np.float32) / 127.5 - 1.0
    return img[None, :, :, None]


def predict_batch(image_tensors: np.ndarray, converter, model, variables,
                  prediction: str = "Attn", batch_max_length: int = 25,
                  forward=None) -> list:
    """Batched greedy decode + cumprod confidence over N crops in ONE
    device call (``src/test_ocr.py:59-108`` semantics, vectorised).

    The per-word loop the reference runs (and ``predict`` preserves) costs
    one RPC per crop through the tunneled TPU runtime (~70 ms each); this
    path amortises it to one forward per batch and does the softmax/argmax
    postprocessing in numpy so no further device chatter is added. Returns
    ``[{"pred": str, "score": float}, ...]`` aligned with the batch."""
    import jax

    if forward is None:
        forward = jax.jit(partial(model.apply, train=False))
    logits = np.asarray(forward(variables, jnp.asarray(image_tensors)))
    batch_size = logits.shape[0]
    # numerically-stable softmax max-prob, all in numpy (zero extra RPCs)
    shifted = logits - logits.max(axis=2, keepdims=True)
    exp = np.exp(shifted, dtype=np.float64)
    max_probs = exp.max(axis=2) / exp.sum(axis=2)
    indices = logits.argmax(axis=2)

    if "CTC" in prediction:
        lengths = [logits.shape[1]] * batch_size
        preds_str = converter.decode(indices.reshape(-1), lengths)
    else:
        lengths = [batch_max_length + 1] * batch_size
        preds_str = converter.decode(indices, lengths)

    results = []
    for b in range(batch_size):
        pred = preds_str[b]
        pred_max_prob = max_probs[b]
        if "Attn" in prediction:
            eos = pred.find("[s]")
            if eos >= 0:
                pred = pred[:eos]
                pred_max_prob = pred_max_prob[:eos]
        confidence = float(np.cumprod(pred_max_prob)[-1]) if len(
            pred_max_prob) else 0.0
        results.append({"pred": pred, "score": confidence})
    return results


def predict(image_tensors: np.ndarray, converter, model, variables,
            prediction: str = "Attn", batch_max_length: int = 25,
            forward=None) -> dict:
    """Greedy decode + cumprod confidence (``src/test_ocr.py:59-108``)."""
    return predict_batch(image_tensors, converter, model, variables,
                         prediction=prediction,
                         batch_max_length=batch_max_length,
                         forward=forward)[0]
