"""DeformConv semantics vs a hand-written numpy oracle of torchvision
``DeformConv2d`` (``src/modules/resnet.py:54-124`` uses it for the
deformable variants; torchvision is not installed here, so the oracle
implements the documented semantics directly: for each output position the
k-th kernel tap samples the input bilinearly at
``base + (ky-1, kx-1) + (dy_k, dx_k)`` with zeros outside the image, and
offset channels are ordered ``[dy_0, dx_0, dy_1, dx_1, ...]`` row-major
over kernel taps).

VERDICT r3 ask #5: rule an implementation bug in ``models/deform.py`` in
or out of the DCN quality gap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from db_text_minimal_tpu.models.deform import DeformConv, _bilinear_sample


def _oracle_bilinear(img, y, x):
    """img (H, W, C); scalar float y, x; zeros outside."""
    h, w, c = img.shape

    def at(yy, xx):
        if 0 <= yy < h and 0 <= xx < w:
            return img[yy, xx]
        return np.zeros(c, img.dtype)

    y0, x0 = int(np.floor(y)), int(np.floor(x))
    wy, wx = y - y0, x - x0
    top = at(y0, x0) * (1 - wx) + at(y0, x0 + 1) * wx
    bot = at(y0 + 1, x0) * (1 - wx) + at(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def _oracle_deform(x, offsets, kernel, stride):
    """x (N, H, W, C); offsets (N, OH, OW, 9, 2) as (dy, dx) per tap
    row-major; kernel (3, 3, C, F); padding 1."""
    n, h, w, c = x.shape
    _, oh, ow, _, _ = offsets.shape
    f = kernel.shape[-1]
    out = np.zeros((n, oh, ow, f), np.float64)
    for b in range(n):
        for oy in range(oh):
            for ox in range(ow):
                for ky in range(3):
                    for kx in range(3):
                        tap = ky * 3 + kx
                        dy, dx = offsets[b, oy, ox, tap]
                        sy = oy * stride + (ky - 1) + dy
                        sx = ox * stride + (kx - 1) + dx
                        v = _oracle_bilinear(x[b], sy, sx)
                        out[b, oy, ox] += v @ kernel[ky, kx]
    return out


@pytest.mark.parametrize("stride", [1, 2])
def test_deform_conv_matches_documented_torchvision_semantics(stride):
    rng = np.random.default_rng(0)
    n, h, w, c, feats = 2, 9, 10, 4, 6
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)

    model = DeformConv(feats, stride=stride)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(np.asarray, variables["params"])

    # offset conv is zero-init (matches reference constant_init 0); give it
    # real weights so offsets vary per pixel and are exercised end to end
    ok = rng.standard_normal(
        params["offset_conv"]["kernel"].shape).astype(np.float32) * 0.3
    ob = rng.standard_normal(18).astype(np.float32) * 0.5
    params = dict(params)
    params["offset_conv"] = {"kernel": ok, "bias": ob}

    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)),
                     np.float64)

    # numpy offset conv: 3x3, pad 1, given stride (zero padding)
    oh = (h + stride - 1) // stride
    ow = (w + stride - 1) // stride
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    offs = np.zeros((n, oh, ow, 18), np.float64)
    for oy in range(oh):
        for ox in range(ow):
            patch = xp[:, oy * stride:oy * stride + 3,
                       ox * stride:ox * stride + 3, :]
            offs[:, oy, ox] = np.einsum("nhwc,hwcf->nf", patch, ok) + ob
    offsets = offs.reshape(n, oh, ow, 9, 2)  # [dy, dx] per tap, row-major

    want = _oracle_deform(x.astype(np.float64), offsets,
                          np.asarray(params["kernel"], np.float64), stride)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bilinear_sample_zero_outside_and_exact_on_grid():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 5, 6, 3)).astype(np.float32)
    # exact grid points reproduce the pixel
    y = jnp.asarray([[[2.0]]])
    x = jnp.asarray([[[3.0]]])
    got = np.asarray(_bilinear_sample(jnp.asarray(img), y, x))
    np.testing.assert_allclose(got[0, 0, 0], img[0, 2, 3], rtol=1e-6)
    # fully outside reads zero
    got = np.asarray(_bilinear_sample(
        jnp.asarray(img), jnp.asarray([[[-7.0]]]), jnp.asarray([[[2.0]]])))
    assert np.all(got == 0)
    # half-in boundary position interpolates against implicit zeros
    got = np.asarray(_bilinear_sample(
        jnp.asarray(img), jnp.asarray([[[-0.5]]]), jnp.asarray([[[2.0]]])))
    np.testing.assert_allclose(got[0, 0, 0], 0.5 * img[0, 0, 2], rtol=1e-5)


def test_dcn_offset_lr_mult_scales_only_offset_updates():
    """optimizer.dcn_offset_lr_mult must scale the offset_conv branch's
    Adam updates and leave every other parameter's updates untouched."""
    import optax

    from db_text_minimal_tpu.config import load_config
    from db_text_minimal_tpu.train.trainer import (_dcn_offset_mask,
                                                   make_optimizer)

    params = {
        "backbone": {
            "layer1_0": {
                "conv2": {
                    "offset_conv": {"kernel": jnp.ones((3, 3, 4, 18)),
                                    "bias": jnp.zeros((18,))},
                    "kernel": jnp.ones((3, 3, 4, 4)),
                },
                "conv1": {"kernel": jnp.ones((3, 3, 4, 4))},
            }
        }
    }
    mask = _dcn_offset_mask(params)
    assert mask["backbone"]["layer1_0"]["conv2"]["offset_conv"]["kernel"]
    assert not mask["backbone"]["layer1_0"]["conv2"]["kernel"]
    assert not mask["backbone"]["layer1_0"]["conv1"]["kernel"]

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    cfg = load_config(None)
    cfg.optimizer.dcn_offset_lr_mult = 0.1
    tx = make_optimizer(cfg)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    off = np.asarray(
        updates["backbone"]["layer1_0"]["conv2"]["offset_conv"]["kernel"])
    reg = np.asarray(updates["backbone"]["layer1_0"]["conv2"]["kernel"])
    # grads are all-ones, so every update value is uniform per leaf
    np.testing.assert_allclose(off.ravel(), 0.1 * reg.ravel()[0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(updates["backbone"]["layer1_0"]["conv1"]["kernel"]),
        reg, rtol=1e-6)

    cfg.optimizer.dcn_offset_lr_mult = 1.0
    tx = make_optimizer(cfg)
    updates, _ = tx.update(grads, tx.init(params), params)
    off = np.asarray(
        updates["backbone"]["layer1_0"]["conv2"]["offset_conv"]["kernel"])
    np.testing.assert_allclose(off.ravel(), reg.ravel()[0], rtol=1e-6)
