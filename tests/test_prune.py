"""Structured channel pruning (models/prune.py): exactness on dead
channels, shape/consumer consistency, sidecar round-trip, head fusion of a
pruned model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from db_text_minimal_tpu.models import DBTextModel
from db_text_minimal_tpu.models.prune import (load_widths,
                                              prune_dbnet_variables,
                                              save_widths,
                                              widths_to_model_kwargs)

RNG = jax.random.PRNGKey(7)
X = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3))


def _init():
    m = DBTextModel()
    return m, m.init(RNG, jnp.zeros((1, 64, 64, 3)), train=False)


def _tree_np(t):
    return jax.tree.map(lambda a: np.array(a), t)  # writable copies


def _zero_channels(variables, n_dead=16):
    """Make the LAST n_dead conv1 channels of layer3_0 exactly dead
    (kernel 0, bn scale 0, bias 0, stats neutral) — pruning them must leave
    the function unchanged."""
    v = _tree_np(variables)
    blk = v["params"]["backbone"]["layer3_0"]
    sblk = v["batch_stats"]["backbone"]["layer3_0"]
    c = blk["conv1"]["kernel"].shape[-1]
    dead = np.arange(c - n_dead, c)
    blk["conv1"]["kernel"][..., dead] = 0.0
    blk["bn1"]["scale"][dead] = 0.0
    blk["bn1"]["bias"][dead] = 0.0
    sblk["bn1"]["mean"][dead] = 0.0
    sblk["bn1"]["var"][dead] = 1.0
    return v, dead


def test_dead_channels_dropped_exactly_when_only_that_block_prunable():
    model, variables = _init()
    v, dead = _zero_channels(variables, n_dead=64)
    y_full = np.asarray(model.apply(v, X, train=False))

    # keep=192/256 drops exactly 64 channels per block; for layer3_0 the
    # dead ones score 0 and must be the ones dropped. To isolate, prune at
    # a keep fraction that only affects blocks of width 256 — then compare
    # layer3_0's behavior via the full forward with all OTHER blocks left
    # at default width.
    pruned, widths = prune_dbnet_variables(v, backbone_keep=0.75)
    kw = widths_to_model_kwargs(widths)
    hidden = list(kw["backbone_hidden"])
    # undo pruning for every block except layer3_0 (index 4 in creation
    # order: layer1_0, layer1_1, layer2_0, layer2_1, layer3_0, ...)
    for i, name in enumerate(["layer1_0", "layer1_1", "layer2_0",
                              "layer2_1", "layer3_0", "layer3_1",
                              "layer4_0", "layer4_1"]):
        if name == "layer3_0":
            continue
        hidden[i] = 0
        pruned["params"]["backbone"][name] = \
            _tree_np(v["params"]["backbone"][name])
        pruned["batch_stats"]["backbone"][name] = \
            _tree_np(v["batch_stats"]["backbone"][name])
    kw["backbone_hidden"] = tuple(hidden)

    kept = pruned["params"]["backbone"]["layer3_0"]["conv1"]["kernel"].shape
    assert kept[-1] == 192
    model_p = DBTextModel(**kw)
    y_pruned = np.asarray(model_p.apply(pruned, X, train=False))
    # exact up to f32 reduction-order noise (the narrower conv contraction
    # may be tiled differently by XLA); a wrongly-dropped LIVE channel
    # diverges by ~1e-1 on these sigmoid outputs
    np.testing.assert_allclose(y_pruned, y_full, atol=1e-4)


def test_fpn_groups_shapes_and_forward():
    model, variables = _init()
    v = _tree_np(variables)
    pruned, widths = prune_dbnet_variables(v, fpn_inner_keep=0.75,
                                           fpn_out_keep=0.5)
    assert widths["fpn_inner_quarter"] == 48
    assert widths["fpn_out"] == 128
    assert widths["head_width"] == 64
    p = pruned["params"]["segmentation_body"]
    assert p["reduce_conv_c5"]["conv"]["kernel"].shape == (1, 1, 512, 48)
    assert p["smooth_p2"]["conv"]["kernel"].shape == (3, 3, 48, 48)
    assert p["conv"]["kernel"].shape == (3, 3, 192, 128)
    hp = pruned["params"]["segmentation_head"]
    assert hp["binarize"]["conv1"]["kernel"].shape == (3, 3, 128, 64)
    model_p = DBTextModel(**widths_to_model_kwargs(widths))
    y = model_p.apply(pruned, X, train=False)
    assert y.shape == (1, 64, 64, 2)
    assert np.all(np.asarray(y) >= 0) and np.all(np.asarray(y) <= 1)


def test_combined_pruning_param_reduction_and_fusion():
    model, variables = _init()
    v = _tree_np(variables)
    pruned, widths = prune_dbnet_variables(
        v, backbone_keep=0.5, fpn_inner_keep=0.75, fpn_out_keep=0.5)
    n_full = sum(x.size for x in jax.tree.leaves(v["params"]))
    n_pruned = sum(x.size for x in jax.tree.leaves(pruned["params"]))
    assert n_pruned < 0.75 * n_full
    kw = widths_to_model_kwargs(widths)
    model_p = DBTextModel(**kw)
    y = model_p.apply(pruned, X, train=False)
    assert y.shape == (1, 64, 64, 2)

    # the fused inference head must stay weight-equivalent on a pruned model
    from db_text_minimal_tpu.models.head import fuse_variables

    fused = fuse_variables(pruned)
    model_f = DBTextModel(head_name="FusedDBHead", **kw)
    y_f = model_f.apply(fused, X, train=False)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y), atol=2e-5)


def test_widths_sidecar_roundtrip(tmp_path):
    widths = {"backbone_hidden": [0, 32, 0, 64, 0, 0, 256, 0],
              "fpn_inner_quarter": 48, "fpn_out": 128, "head_width": 64}
    ckpt = str(tmp_path / "m.ckpt")
    save_widths(ckpt, widths)
    assert load_widths(ckpt) == widths
    assert load_widths(str(tmp_path / "missing.ckpt")) is None
    kw = widths_to_model_kwargs(load_widths(ckpt))
    assert kw["backbone_hidden"] == (0, 32, 0, 64, 0, 0, 256, 0)
    assert kw["fpn_out"] == 128


def test_prune_cli_end_to_end(tmp_path):
    """ckpt → cli.prune → sidecar-aware reload via cli.common.load_model →
    forward; plus a pruned-checkpoint eval through quality_bench's Trainer
    path (cfg.model.widths)."""
    from db_text_minimal_tpu.cli import prune as prune_cli
    from db_text_minimal_tpu.cli.common import load_model
    from db_text_minimal_tpu.train.checkpoints import save_checkpoint

    model, variables = _init()
    src = str(tmp_path / "full.ckpt")
    save_checkpoint(src, {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]})
    out = str(tmp_path / "pruned.ckpt")
    report = prune_cli.main(prune_cli.load_args(
        ["--checkpoint", src, "--out", out,
         "--backbone_keep", "0.5", "--fpn_inner_keep", "0.75",
         "--fpn_out_keep", "0.5"]))
    assert report["params"]["ratio"] < 0.75
    assert os.path.exists(out + ".widths.json")

    m2, v2 = load_model(out)
    y = m2.apply({"params": v2["params"],
                  "batch_stats": v2["batch_stats"]}, X, train=False)
    assert y.shape == (1, 64, 64, 2)


def test_pruned_model_composes_with_folded_and_int8_paths():
    """The production serving rewrites (BN folding, selective int8) are
    shape-generic and must keep working on pruned variables; the
    non-quantized folded forward stays weight-equivalent."""
    from db_text_minimal_tpu.models.head import fuse_variables
    from db_text_minimal_tpu.models.quant_infer import (
        prepare_quant_params, quant_dbnet_forward)

    model, variables = _init()
    pruned, widths = prune_dbnet_variables(
        _tree_np(variables), backbone_keep=0.5, fpn_inner_keep=0.75,
        fpn_out_keep=0.5)
    kw = widths_to_model_kwargs(widths)
    fused = fuse_variables(pruned)
    y_flax = np.asarray(
        DBTextModel(head_name="FusedDBHead", **kw).apply(fused, X,
                                                         train=False))
    # folded, no quantization: weight-exact rewrite
    qv = prepare_quant_params(fused, skip=(), min_out_channels=10 ** 9)
    y_folded = np.asarray(quant_dbnet_forward(qv, X))
    np.testing.assert_allclose(y_folded, y_flax, atol=2e-4)
    # int8 of the still-wide convs: runs and stays in range
    qv8 = prepare_quant_params(fused, skip=(), min_out_channels=128)
    y8 = np.asarray(quant_dbnet_forward(qv8, X))
    assert y8.shape == y_flax.shape
    assert np.all(y8 >= 0) and np.all(y8 <= 1)


def test_dcn_blocks_left_unpruned():
    m = DBTextModel(backbone_name="deformable_resnet18")
    v = m.init(RNG, jnp.zeros((1, 64, 64, 3)), train=False)
    pruned, widths = prune_dbnet_variables(_tree_np(v), backbone_keep=0.5)
    hidden = widths.get("backbone_hidden", [0] * 8)
    # layer1 blocks (no DCN) prune; layer2..4 blocks (DeformConv conv2) skip
    assert hidden[0] == 32 and hidden[1] == 32
    assert all(h == 0 for h in hidden[2:])


def test_reprune_merges_widths_sidecar(tmp_path):
    """Pruning an already-pruned checkpoint must carry forward the source
    sidecar's widths for groups the second pass leaves untouched — a
    pass-2 sidecar missing pass-1's backbone widths makes the checkpoint
    unloadable (round-3 code-review finding)."""
    from db_text_minimal_tpu.cli import prune as prune_cli
    from db_text_minimal_tpu.cli.common import load_model
    from db_text_minimal_tpu.train.checkpoints import save_checkpoint

    model, variables = _init()
    src = str(tmp_path / "full.ckpt")
    save_checkpoint(src, {"params": variables["params"],
                          "batch_stats": variables["batch_stats"]})
    out1 = str(tmp_path / "p1.ckpt")
    prune_cli.main(prune_cli.load_args(
        ["--checkpoint", src, "--out", out1, "--backbone_keep", "0.5"]))
    out2 = str(tmp_path / "p2.ckpt")
    prune_cli.main(prune_cli.load_args(
        ["--checkpoint", out1, "--out", out2, "--fpn_out_keep", "0.5"]))

    w1, w2 = load_widths(out1), load_widths(out2)
    assert w2["backbone_hidden"] == w1["backbone_hidden"]
    assert w2["fpn_out"] and w2["head_width"]

    m2, v2 = load_model(out2)
    y = m2.apply({"params": v2["params"],
                  "batch_stats": v2["batch_stats"]}, X, train=False)
    assert y.shape == (1, 64, 64, 2)


def test_prunable_guard_int_vs_float_semantics():
    """Advisor r3: int keep-counts must not be swallowed by 1 == 1.0."""
    from db_text_minimal_tpu.models.prune import _keep_indices, _prunable

    assert _prunable(None) is False
    assert _prunable(1.0) is False
    assert _prunable(0.5) is True
    assert _prunable(1) is True          # absolute count: keep ONE channel
    assert _prunable(128) is True
    assert _prunable(True) is False      # bools are not counts

    scores = np.arange(8, dtype=np.float64)
    assert _keep_indices(scores, 1).tolist() == [7]
    assert _keep_indices(scores, 0.5).tolist() == [4, 5, 6, 7]


def test_prune_cli_keep_arg_parses_counts_and_fractions():
    from db_text_minimal_tpu.cli.prune import _keep_arg

    assert _keep_arg("0.5") == 0.5
    assert _keep_arg("1") == 1.0 and isinstance(_keep_arg("1"), float)
    assert _keep_arg("128") == 128 and isinstance(_keep_arg("128"), int)
