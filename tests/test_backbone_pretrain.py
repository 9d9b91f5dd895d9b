"""Backbone pretext pretraining + torchvision .pth export round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_flax_torchvision_roundtrip(tmp_path):
    """Export a Flax backbone as torchvision .pth, re-import through the
    pretrained-backbone path: every array must come back bit-identical."""
    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.utils.torch_port import (
        load_pretrained_backbone, save_backbone_pth)

    m = DBTextModel()
    v = m.init(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)), train=False)
    v = jax.device_get(v)
    src_p = v["params"]["backbone"]
    src_s = v["batch_stats"]["backbone"]
    path = str(tmp_path / "bb.pth")
    save_backbone_pth(path, src_p, src_s)

    # fresh random init, then warm start from the .pth
    m2 = DBTextModel()
    v2 = m2.init(jax.random.PRNGKey(99), jnp.zeros((1, 64, 64, 3)),
                 train=False)
    v2 = jax.device_get(v2)
    params, stats = load_pretrained_backbone(path, v2["params"],
                                             v2["batch_stats"])

    flat_src = jax.tree_util.tree_leaves_with_path(src_p)
    flat_dst_map = dict(jax.tree_util.tree_leaves_with_path(
        params["backbone"]))
    restored = dict(flat_dst_map)
    for key, val in flat_src:
        np.testing.assert_array_equal(np.asarray(val),
                                      np.asarray(restored[key]), err_msg=str(key))
    for key, val in jax.tree_util.tree_leaves_with_path(src_s):
        got = dict(jax.tree_util.tree_leaves_with_path(
            stats["backbone"]))[key]
        np.testing.assert_array_equal(np.asarray(val), np.asarray(got),
                                      err_msg=str(key))
    # head params untouched by the warm start
    np.testing.assert_array_equal(
        np.asarray(params["segmentation_head"]["binarize"]["conv1"]["kernel"]),
        np.asarray(v2["params"]["segmentation_head"]["binarize"]["conv1"]
                   ["kernel"]))


def test_sample_patches_balanced(tmp_path):
    from db_text_minimal_tpu.data.synthetic import generate
    from db_text_minimal_tpu.train.backbone_pretrain import (
        load_scene_bboxes, sample_patches)

    section = generate(str(tmp_path / "ds"), n_train=3, n_test=1, size=320,
                       seed=4)
    images, bboxes = load_scene_bboxes(section["train_dir"],
                                       section["train_gt_dir"])
    assert len(images) == 3 and all(len(b) >= 1 for b in bboxes)
    rng = np.random.RandomState(0)
    xs, ys = sample_patches(images, bboxes, rng, 8, patch=96)
    assert xs.shape == (8, 96, 96, 3)
    assert set(ys.tolist()) == {0, 1}
    assert ys.sum() == 4          # alternating classes -> exactly balanced


@pytest.mark.slow
def test_pretrain_backbone_end_to_end(tmp_path):
    """Few-step pretext pretraining writes a .pth the detector loads."""
    from db_text_minimal_tpu.data.synthetic import generate
    from db_text_minimal_tpu.train.backbone_pretrain import pretrain_backbone
    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.utils.torch_port import load_pretrained_backbone

    section = generate(str(tmp_path / "ds"), n_train=3, n_test=1, size=320,
                       seed=5)
    out = str(tmp_path / "bb.pth")
    result = pretrain_backbone(section["train_dir"],
                               section["train_gt_dir"], out, steps=2,
                               batch_size=4, limit_images=3)
    assert result["path"] == out
    m = DBTextModel()
    v = jax.device_get(m.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)), train=False))
    params, stats = load_pretrained_backbone(out, v["params"],
                                             v["batch_stats"])
    # pretrained conv1 must differ from the fresh init it replaced
    assert not np.allclose(
        np.asarray(params["backbone"]["conv1"]["kernel"]),
        np.asarray(v["params"]["backbone"]["conv1"]["kernel"]))


def test_pretrain_dense_end_to_end(tmp_path):
    """Dense-pretext pretraining (text-layout prediction at stride 8,
    VERDICT r2 ask #8) writes a torchvision-format .pth the detector's
    warm-start path loads."""
    import numpy as np

    from db_text_minimal_tpu.data.synthetic import generate
    from db_text_minimal_tpu.train.backbone_pretrain import (
        pretrain_backbone_dense)
    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.utils.torch_port import load_pretrained_backbone
    import jax
    import jax.numpy as jnp

    section = generate(str(tmp_path), n_train=3, n_test=1, size=256, seed=1)
    out = str(tmp_path / "bb.pth")
    result = pretrain_backbone_dense(section["train_dir"],
                                     section["train_gt_dir"], out,
                                     steps=2, batch_size=4, limit_images=3,
                                     log=lambda *a: None)
    assert result["path"] == out
    model = DBTextModel()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    params, stats = load_pretrained_backbone(out, v["params"],
                                             v.get("batch_stats", {}))
    # loaded backbone weights differ from init (weights actually imported)
    flat_new = jax.tree_util.tree_leaves(params["backbone"])
    flat_old = jax.tree_util.tree_leaves(v["params"]["backbone"])
    assert any(not np.allclose(a, b) for a, b in zip(flat_new, flat_old))
