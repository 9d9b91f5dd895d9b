"""Training CLI: config-driven end-to-end training.

Rebuild of ``src/train.py``'s hydra main (``make train``): loads
``config.yaml`` (or ``--config``), builds the dataset loaders, TB writer and
Trainer, and runs the epoch loop with per-epoch eval + 3-checkpoint policy.

Usage::

    python -m db_text_minimal_tpu.cli.train [--config config.yaml]
        [--epochs N] [--dataset totaltext]
"""

from __future__ import annotations

import argparse
import os
import time

from ..config import load_config
from ..data import DataLoader, build_dataset
from ..parallel import initialize_multihost, local_batch_slice
from ..train import Trainer

import jax


def load_args(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint to resume full training state from")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of the first "
                             "epoch into this directory")
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser.parse_args(argv)


def main(args=None):
    args = args or load_args()
    initialize_multihost(args.coordinator_address, args.num_processes,
                        args.process_id)
    overrides = {}
    if args.dataset:
        overrides["dataset"] = {"name": args.dataset}
    if args.epochs is not None:
        overrides.setdefault("hps", {})["no_epochs"] = args.epochs
    cfg = load_config(args.config, overrides)
    root = cfg.meta.root_dir or "."
    # pruned checkpoints (cli.prune) carry a .widths.json sidecar — build
    # the matching narrow architecture when resuming/fine-tuning one (the
    # finetune path is root_dir-relative, matching Trainer.init_state)
    ft = cfg.model.finetune_cp_path
    for ckpt in (args.resume, os.path.join(root, str(ft)) if ft else None):
        if ckpt:
            from ..models.prune import load_widths

            widths = load_widths(ckpt)
            if widths:
                cfg["model"]["widths"] = widths
                break

    log_dir = os.path.join(root, cfg.logging.log_dir or "logs",
                           str(int(time.time())))
    os.makedirs(log_dir, exist_ok=True)
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(log_dir)
    except Exception:
        tb_writer = None

    train_ds = build_dataset(cfg, is_training=True)
    test_ds = build_dataset(cfg, is_training=False)
    # hps.batch_size is the GLOBAL batch; each host loads its slice of it
    train_loader = DataLoader(train_ds,
                              local_batch_slice(int(cfg.hps.batch_size)),
                              shuffle=True,
                              num_hosts=jax.process_count(),
                              host_id=jax.process_index())
    test_loader = DataLoader(test_ds, int(cfg.hps.test_batch_size))

    trainer = Trainer(cfg, train_loader, test_loader, tb_writer=tb_writer)
    state = trainer.resume_state(args.resume) if args.resume else None
    if args.profile_dir:
        from ..utils.profiling import trace

        with trace(args.profile_dir):
            state, _, _, _ = trainer.train_epoch(
                state if state is not None else trainer.init_state(), 0)
        state, history = trainer.fit(state=state)
        return state, history
    state, history = trainer.fit(state=state)
    return state, history


if __name__ == "__main__":
    main()
