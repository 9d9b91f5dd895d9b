"""Trainer integration tests (SURVEY.md §4 plan (c)+(d)): short training on
the synthetic dataset with loss decrease, checkpoint round trips, and the
data-parallel path on the virtual 8-device CPU mesh."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from db_text_minimal_tpu.config import load_config
from db_text_minimal_tpu.data import DataLoader, TotalTextDataset
from db_text_minimal_tpu.data.synthetic import generate
from db_text_minimal_tpu.parallel import create_mesh, shard_batch
from db_text_minimal_tpu.train import Trainer, save_checkpoint, \
    restore_checkpoint


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_train")
    section = generate(str(d), n_train=4, n_test=2, size=128, seed=1)
    return d, section


def _small_cfg(tmp_path, section, img_size=128, batch_size=2, **over):
    return load_config(overrides={
        "meta": {"root_dir": str(tmp_path)},
        "hps": {"img_size": img_size, "batch_size": batch_size,
                "test_batch_size": 1, "no_epochs": 1, "log_iter": 1},
        "data": {"synthetic": section},
        "dataset": {"name": "synthetic"},
        "model": {"best_cp_path": "models/best.ckpt",
                  "last_cp_path": "models/last.ckpt",
                  "best_hmean_cp_path": "models/best_hmean.ckpt"},
        "logging": {"logger_file": None},
        **over,
    })


def _loaders(d, cfg):
    train_ds = TotalTextDataset(os.path.join(d, "train_images"),
                                os.path.join(d, "train_gts"), ["###"],
                                is_training=True,
                                image_size=int(cfg.hps.img_size))
    test_ds = TotalTextDataset(os.path.join(d, "test_images"),
                               os.path.join(d, "test_gts"), ["###"],
                               is_training=False,
                               image_size=int(cfg.hps.img_size))
    return (DataLoader(train_ds, int(cfg.hps.batch_size), shuffle=True,
                       prefetch=0),
            DataLoader(test_ds, 1, prefetch=0))


def test_loss_decreases_on_tiny_dataset(synth, tmp_path):
    d, section = synth
    cfg = _small_cfg(tmp_path, section)
    train_loader, test_loader = _loaders(str(d), cfg)
    trainer = Trainer(cfg, train_loader, test_loader)
    state = trainer.init_state(image_size=128, batch_size=2)

    losses = []
    for epoch in range(4):
        state, mean_loss, running, _ = trainer.train_epoch(state, epoch)
        losses.append(mean_loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # eval path end to end: loss + pixel metrics + box P/R/F
    test_loss, running, recall, precision, hmean = trainer.eval_epoch(state)
    assert np.isfinite(test_loss)
    assert 0.0 <= hmean <= 1.0


def test_fit_saves_three_checkpoints(synth, tmp_path):
    d, section = synth
    cfg = _small_cfg(tmp_path, section)
    train_loader, test_loader = _loaders(str(d), cfg)
    trainer = Trainer(cfg, train_loader, test_loader)
    state, history = trainer.fit(no_epochs=1)
    assert len(history) == 1
    assert os.path.exists(tmp_path / "models" / "last.ckpt")
    assert os.path.exists(tmp_path / "models" / "best_hmean.ckpt")
    assert os.path.exists(tmp_path / "models" / "best.ckpt")


def test_checkpoint_roundtrip(tmp_path):
    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.int32(7)}
    path = str(tmp_path / "cp.ckpt")
    save_checkpoint(path, tree, {"note": "test"})
    zero = jax.tree.map(np.zeros_like, tree)
    restored = restore_checkpoint(path, zero)
    np.testing.assert_array_equal(restored["params"]["w"],
                                  tree["params"]["w"])
    assert restored["step"] == 7
    assert os.path.exists(path + ".json")


def test_data_parallel_8_device_mesh(synth, tmp_path):
    """Train step over all 8 virtual CPU devices: batch sharded on 'data',
    params replicated, XLA inserts the gradient psum."""
    d, section = synth
    assert len(jax.devices()) == 8
    cfg = _small_cfg(tmp_path, section, batch_size=8)
    train_loader, test_loader = _loaders(str(d), cfg)
    mesh = create_mesh()
    assert mesh.devices.size == 8
    trainer = Trainer(cfg, train_loader, test_loader, mesh=mesh)
    state = trainer.init_state(image_size=128, batch_size=8)

    ds = train_loader.dataset
    batch = {
        "img": np.stack([ds[i % len(ds)]["img"] for i in range(8)]),
        "prob_map": np.stack([ds[i % len(ds)]["prob_map"]
                              for i in range(8)]),
        "supervision_mask": np.stack(
            [ds[i % len(ds)]["supervision_mask"] for i in range(8)]),
        "thresh_map": np.stack([ds[i % len(ds)]["thresh_map"]
                                for i in range(8)]),
        "text_area_map": np.stack([ds[i % len(ds)]["text_area_map"]
                                   for i in range(8)]),
    }
    device_batch = shard_batch(batch, mesh)
    # the batch really is split across devices
    assert len(device_batch["img"].sharding.device_set) == 8
    state2, loss_out, hist, preds = trainer._train_step(
        state, device_batch, jnp.float32(1e-3))
    assert np.isfinite(float(loss_out.total_loss))
    assert preds.shape == (8, 128, 128, 3)
    # params stay replicated after the update
    leaf = jax.tree.leaves(state2.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_resume_restores_full_state(synth, tmp_path):
    """True resume: optimizer moments and step counter survive the round
    trip (the reference saved only model weights)."""
    d, section = synth
    cfg = _small_cfg(tmp_path, section)
    train_loader, test_loader = _loaders(str(d), cfg)
    trainer = Trainer(cfg, train_loader, test_loader)
    state = trainer.init_state(image_size=128, batch_size=2)
    state, _, _, _ = trainer.train_epoch(state, 0)
    steps_done = int(jax.device_get(state.step))
    assert steps_done > 0

    from db_text_minimal_tpu.train import save_checkpoint

    host = jax.device_get(state)
    ckpt = str(tmp_path / "resume.ckpt")
    save_checkpoint(ckpt, {"params": host.params,
                           "batch_stats": host.batch_stats,
                           "opt_state": host.opt_state,
                           "step": host.step})

    trainer2 = Trainer(cfg, train_loader, test_loader)
    restored = trainer2.resume_state(ckpt, image_size=128, batch_size=2)
    assert int(jax.device_get(restored.step)) == steps_done
    assert trainer2.global_step == steps_done
    # optimizer moments restored (non-zero after training)
    mu_leaves = jax.tree.leaves(jax.device_get(restored.opt_state))
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in mu_leaves
               if hasattr(l, "shape") and np.asarray(l).size > 1)
    # training continues from the restored state
    restored, loss, _, _ = trainer2.train_epoch(restored, 1)
    assert np.isfinite(loss)
    assert int(jax.device_get(restored.step)) > steps_done


def test_training_with_true_ohem(synth, tmp_path):
    """reduction='none' (correct per-pixel OHEM) path trains under jit."""
    d, section = synth
    cfg = _small_cfg(tmp_path, section,
                     optimizer={"reduction": "none"})
    train_loader, test_loader = _loaders(str(d), cfg)
    trainer = Trainer(cfg, train_loader, test_loader)
    state = trainer.init_state(image_size=128, batch_size=2)
    state, loss, _, _ = trainer.train_epoch(state, 0)
    assert np.isfinite(loss) and loss > 0


def test_orbax_checkpoint_backend(tmp_path):
    from db_text_minimal_tpu.train import restore_checkpoint, save_checkpoint

    tree = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": np.asarray(7, np.int32)}
    path = str(tmp_path / "cp_orbax")
    save_checkpoint(path, tree, {"note": "orbax"}, backend="orbax")
    assert os.path.isdir(path)
    restored = restore_checkpoint(path, jax.tree.map(np.zeros_like, tree))
    np.testing.assert_array_equal(restored["params"]["w"],
                                  tree["params"]["w"])
    assert int(restored["step"]) == 7


def test_eval_epoch_with_batch_size_two(synth, tmp_path):
    """Batched evaluation: the reference forced test_batch_size=1
    (example_config.yaml:10); our eval loop handles >1 (anns ride along as
    per-image lists, postprocess iterates the batch)."""
    d, section = synth
    cfg = _small_cfg(tmp_path, section)
    cfg.hps.test_batch_size = 2
    train_loader, _ = _loaders(str(d), cfg)
    from db_text_minimal_tpu.data import DataLoader as DL
    from db_text_minimal_tpu.data import TotalTextDataset as TT

    test_loader = DL(TT(os.path.join(str(d), "test_images"),
                        os.path.join(str(d), "test_gts"), ["###"],
                        is_training=False, image_size=128),
                     2, prefetch=0)
    trainer = Trainer(cfg, train_loader, test_loader)
    state = trainer.init_state(image_size=128, batch_size=2)
    test_loss, running, recall, precision, hmean = trainer.eval_epoch(state)
    assert np.isfinite(test_loss)
    assert 0.0 <= hmean <= 1.0


def test_in_train_eval_device_representer_default(synth, tmp_path,
                                                  monkeypatch):
    """The per-epoch eval inside a training process defaults to the DEVICE
    representer with metric.device_boxes=True (the round-5 diag_inproc
    probe measured bitwise in-process parity, resolving docs/PERFORMANCE.md
    REOPENED note); metric.device_boxes_in_train=False opts back out to
    the host representer."""
    from db_text_minimal_tpu.train import trainer as trainer_mod

    d, section = synth
    cfg = _small_cfg(tmp_path, section)
    cfg.metric.is_output_polygon = False
    cfg.metric.device_boxes = True
    train_loader, test_loader = _loaders(str(d), cfg)

    used = []
    real_dev, real_host = (trainer_mod.DeviceBoxRepresenter,
                           trainer_mod.SegDetectorRepresenter)

    def spy(cls, name):
        def make(*a, **k):
            used.append(name)
            return cls(*a, **k)
        return make

    monkeypatch.setattr(trainer_mod, "DeviceBoxRepresenter",
                        spy(real_dev, "device"))
    monkeypatch.setattr(trainer_mod, "SegDetectorRepresenter",
                        spy(real_host, "host"))

    trainer = Trainer(cfg, train_loader, test_loader)
    state = trainer.init_state(image_size=128, batch_size=2)
    trainer.eval_epoch(state)
    assert used == ["device"]

    cfg.metric.device_boxes_in_train = False
    used.clear()
    trainer.eval_epoch(state)
    assert used == ["host"]


@pytest.mark.slow
def test_cli_train_finetunes_pruned_checkpoint_with_sidecars(synth, tmp_path):
    """cli.train end-to-end on a cli.prune-style checkpoint: the
    root_dir-relative widths-sidecar lookup builds the narrow model, the
    params-only checkpoint loads into init_state (optimizer starts fresh),
    and every checkpoint the run writes carries its own .widths.json
    (round-3 code-review findings)."""
    import yaml

    from db_text_minimal_tpu.cli import train as train_cli
    from db_text_minimal_tpu.models.prune import (load_widths,
                                                  prune_dbnet_variables,
                                                  save_widths)

    d, section = synth
    cfg = _small_cfg(tmp_path, section)
    trainer = Trainer(cfg, *_loaders(d, cfg))
    host = jax.device_get(trainer.init_state())
    pruned, widths = prune_dbnet_variables(
        {"params": host.params, "batch_stats": host.batch_stats},
        backbone_keep=0.5, fpn_out_keep=0.5)
    os.makedirs(tmp_path / "models", exist_ok=True)
    ckpt = str(tmp_path / "models" / "pruned.ckpt")
    save_checkpoint(ckpt, pruned)          # params-only: no opt_state/step
    save_widths(ckpt, widths)

    cfg_file = str(tmp_path / "cfg.yaml")
    with open(cfg_file, "w") as f:
        yaml.safe_dump({
            "meta": {"root_dir": str(tmp_path)},
            "hps": {"img_size": 128, "batch_size": 2, "test_batch_size": 1,
                    "no_epochs": 1, "log_iter": 1},
            "data": {"synthetic": dict(section)},
            "dataset": {"name": "synthetic"},
            "model": {"finetune_cp_path": "models/pruned.ckpt"},
            "logging": {"logger_file": None},
        }, f)
    state, history = train_cli.main(
        train_cli.load_args(["--config", cfg_file, "--epochs", "1"]))
    assert len(history) == 1

    # the narrow architecture was really built and trained
    p = jax.device_get(state).params
    assert (p["segmentation_body"]["conv"]["kernel"].shape[-1]
            == widths["fpn_out"])
    # every checkpoint the policy wrote carries the widths sidecar
    for name in ("best_cp.ckpt", "last_cp.ckpt", "best_hmean_cp.ckpt"):
        path = str(tmp_path / "models" / name)
        assert os.path.exists(path), name
        assert load_widths(path) == widths, name
