"""Model tests: shapes/ranges for the Flax DBNet family, jit-compilation, and
numerical parity against the reference PyTorch model via the checkpoint
porter (SURVEY.md §4 plan (b))."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from db_text_minimal_tpu.models import DBTextModel
from db_text_minimal_tpu.models.resnet import resnet18, resnet50

REFERENCE = "/root/reference/src"


def test_backbone_feature_pyramid():
    m = resnet18()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    c2, c3, c4, c5 = m.apply(vars_, x)
    assert c2.shape == (1, 16, 16, 64)     # stride 4
    assert c3.shape == (1, 8, 8, 128)      # stride 8
    assert c4.shape == (1, 4, 4, 256)      # stride 16
    assert c5.shape == (1, 2, 2, 512)      # stride 32


def test_resnet50_channels():
    m = resnet50()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(vars_, x)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]


def test_dbnet_train_eval_modes():
    m = DBTextModel()
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.shape == (2, 64, 64, 2)      # P, T (models.py:47-48 eval)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    out3, _ = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert out3.shape == (2, 64, 64, 3)     # P, T, B-hat (train)


def test_dbnet_jit_compiles():
    m = DBTextModel()
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    fwd = jax.jit(lambda v, inp: m.apply(v, inp, train=False))
    out = fwd(vars_, x)
    assert out.shape == (1, 64, 64, 2)


def test_fpem_ffm_neck():
    m = DBTextModel(neck_name="FPEM_FFM")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.shape == (1, 64, 64, 2)


def test_deformable_resnet18():
    m = DBTextModel(backbone_name="deformable_resnet18")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(vars_, x, train=False)
    assert out.shape == (1, 64, 64, 2)


def test_resize_bilinear_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    from db_text_minimal_tpu.models.layers import resize_bilinear_align_corners

    x = np.random.RandomState(0).rand(1, 3, 20, 24).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(37, 41), mode="bilinear",
        align_corners=True).numpy()
    ours = resize_bilinear_align_corners(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), (37, 41))
    np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                               ref, atol=2e-5)


def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    from db_text_minimal_tpu.models.layers import resize_nearest

    x = np.random.RandomState(0).rand(1, 4, 7, 9).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(15, 14)).numpy()  # default: nearest
    ours = resize_nearest(jnp.asarray(np.transpose(x, (0, 2, 3, 1))), (15, 14))
    np.testing.assert_array_equal(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_parity_with_reference_torch_model():
    """Port random-init reference weights; outputs must match to float noise
    when conv precision is raised (bf16-dominant default on TPU is a
    deliberate speed/precision trade, not a porting error)."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        import modules.resnet as ref_resnet
        ref_resnet.model_zoo.load_url = lambda url: {}
        from models import DBTextModel as TorchDB
    finally:
        sys.path.remove(REFERENCE)

    from db_text_minimal_tpu.utils.torch_port import torch_state_dict_to_flax

    torch.manual_seed(0)
    tm = TorchDB().eval()
    params, stats = torch_state_dict_to_flax(tm.state_dict())

    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()

    m = DBTextModel()
    with jax.default_matmul_precision("highest"):
        ours = m.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                       train=False)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert ref_out.shape == ours.shape
    np.testing.assert_allclose(ours, ref_out, atol=5e-5)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
def test_torchvision_backbone_import(tmp_path):
    """ImageNet warm-start path: a torchvision-format ResNet state_dict
    (no 'backbone.' prefix, with fc head) loads into the backbone subtree."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        import modules.resnet as ref_resnet
        ref_resnet.model_zoo.load_url = lambda url: {}
        torch.manual_seed(1)
        tm = ref_resnet.resnet18(pretrained=False)
    finally:
        sys.path.remove(REFERENCE)
    # torchvision layout = reference backbone layout + fc head
    sd = {k: v for k, v in tm.state_dict().items()
          if not k.startswith("smooth")}
    path = str(tmp_path / "resnet18.pth")
    torch.save(sd, path)

    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.utils.torch_port import load_pretrained_backbone

    m = DBTextModel()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                       train=False)
    params, stats = load_pretrained_backbone(
        path, variables["params"], variables.get("batch_stats", {}))
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["conv1"]["kernel"]), want)
    # non-backbone subtrees untouched
    assert "segmentation_head" in params
    # model still runs with merged params
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.zeros((1, 64, 64, 3)), train=False)
    assert out.shape == (1, 64, 64, 2)


def test_fused_head_weight_equivalence():
    """FusedDBHead with fused params must reproduce DBHead outputs
    (inference-time MXU optimization, no retraining)."""
    from db_text_minimal_tpu.models.head import DBHead, FusedDBHead, \
        fuse_db_head_params

    head = DBHead()
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 40, 40, 256).astype(np.float32))
    v = head.init(jax.random.PRNGKey(1), x[:1])
    ref = head.apply(v, x, train=False)

    fp, fs = fuse_db_head_params(v["params"], v["batch_stats"])
    fused = FusedDBHead()
    out = fused.apply({"params": fp, "batch_stats": fs}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_full_model_equivalence():
    from db_text_minimal_tpu.models.head import fuse_variables

    m = DBTextModel()
    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    ref = m.apply(v, x, train=False)
    fused_vars = fuse_variables(v)
    fm = DBTextModel(head_name="FusedDBHead")
    out = fm.apply(fused_vars, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
