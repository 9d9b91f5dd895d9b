"""Dump ALL eval prob/thresh maps + anns for a checkpoint on the hard
benchmark (VERDICT r2 ask #1: per-image device-vs-host flip analysis needs
the full 400-map set; round 2 only dumped 32).

Run from the repo root (PYTHONPATH breaks the axon plugin):
    python dump_maps.py /tmp/hb_models/hb40.ckpt /tmp/hb40_maps_full.npz
"""
import pickle
import sys

import numpy as np

from db_text_minimal_tpu.cli.quality_bench import build_cfg, load_args
from db_text_minimal_tpu.data import DataLoader, build_dataset
from db_text_minimal_tpu.parallel import shard_batch
from db_text_minimal_tpu.train import Trainer
from db_text_minimal_tpu.train.trainer import array_batch


def main(ckpt, out):
    args = load_args(["--data_dir", "/tmp/hard_bench", "--out", "/dev/null",
                      "--eval_only", "--checkpoint", ckpt])
    cfg = build_cfg(args)
    test_ds = build_dataset(cfg, is_training=False)
    test_loader = DataLoader(test_ds, int(cfg.hps.test_batch_size))
    trainer = Trainer(cfg, None, test_loader)
    state = trainer.resume_state(ckpt)
    maps, anns, tags = [], [], []
    for i, batch in enumerate(test_loader):
        device_batch = shard_batch(array_batch(batch), trainer.mesh)
        preds = trainer._eval_step(state, device_batch)[0]
        maps.append(np.asarray(preds, np.float32))
        anns.extend(batch["anns"])
        tags.extend(batch["ignore_tags"])
        print("batch", i, flush=True)
    maps = np.concatenate(maps, 0)
    np.savez_compressed(out, maps=maps)
    with open(out + ".anns.pkl", "wb") as f:
        pickle.dump({"anns": anns, "ignore_tags": tags}, f)
    print("dumped", maps.shape, "->", out, flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
