"""Checkpointing: params + batch stats + optimizer state + step.

Upgrade over the reference's plain ``torch.save(state_dict)`` policy
(``src/train.py:288-318``): the same three checkpoint roles (best_hmean,
best train+test loss, last — ``example_config.yaml:62-66``) but with full
training state so resume continues optimization instead of restarting it
(the reference saves no optimizer/scheduler/epoch state, SURVEY.md §5).

Orbax is used when available; a flax-serialization msgpack fallback keeps
checkpoints working in minimal environments. A ``.pth`` import path exists
via ``utils.torch_port`` for reference-checkpoint parity runs.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: dict[str, Any],
                    metadata: dict | None = None,
                    backend: str = "flax") -> None:
    """Serialize a state pytree (params/batch_stats/opt_state/step/...).

    ``backend='flax'`` (default): one msgpack file — simple, portable.
    ``backend='orbax'``: an orbax ``StandardCheckpointer`` directory at
    ``path`` — async-friendly and multi-host-aware for pod-scale jobs."""
    state = _to_host(state)
    if backend == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), state)
        ckptr.wait_until_finished()
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        blob = serialization.to_bytes(state)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    if metadata is not None:
        with open(path.rstrip("/") + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def restore_checkpoint(path: str, template: dict[str, Any]) -> dict[str, Any]:
    """Restore into the structure of ``template`` (auto-detects backend:
    orbax checkpoints are directories, flax msgpack are files)."""
    template = _to_host(template)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), template)
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(template, blob)


def load_params_any(path: str, template: dict[str, Any] | None = None):
    """Load model params from either a native checkpoint or a reference
    ``.pth`` torch state_dict (``utils.torch_port``). Returns
    ``{"params": ..., "batch_stats": ...}``."""
    if path.endswith(".pth"):
        from ..utils.torch_port import load_torch_checkpoint

        params, stats = load_torch_checkpoint(path)
        return {"params": params, "batch_stats": stats}
    if template is None:
        # structure-free restore (inference-only loads)
        with open(path, "rb") as f:
            state = serialization.msgpack_restore(f.read())
    else:
        state = restore_checkpoint(path, template)
    return {"params": state["params"], "batch_stats": state["batch_stats"]}


class CheckpointPolicy:
    """The reference's three-checkpoint policy (``src/train.py:288-318``)."""

    def __init__(self, root_dir: str, best_cp_path: str, last_cp_path: str,
                 best_hmean_cp_path: str, widths: dict | None = None):
        self.best_cp_path = os.path.join(root_dir, best_cp_path)
        self.last_cp_path = os.path.join(root_dir, last_cp_path)
        self.best_hmean_cp_path = os.path.join(root_dir, best_hmean_cp_path)
        self.best_test_loss = np.inf
        self.best_train_loss = np.inf
        self.best_hmean = 0.0
        # pruned-architecture widths (models/prune.py): every checkpoint this
        # policy writes needs the sidecar or later loaders build the
        # default-width model against narrow params
        self.widths = dict(widths) if widths else None

    def _save(self, path: str, state, meta) -> None:
        save_checkpoint(path, state, meta)
        if self.widths:
            from ..models.prune import save_widths

            save_widths(path, self.widths)

    def on_epoch_end(self, state, *, train_loss: float, test_loss: float,
                     hmean: float, epoch: int) -> list[str]:
        saved = []
        meta = {"epoch": epoch, "train_loss": train_loss,
                "test_loss": test_loss, "hmean": hmean}
        if hmean >= self.best_hmean:                 # train.py:288-292
            self.best_hmean = hmean
            self._save(self.best_hmean_cp_path, state, meta)
            saved.append(self.best_hmean_cp_path)
        if (test_loss <= self.best_test_loss
                and train_loss <= self.best_train_loss):  # train.py:304-308
            self.best_test_loss = test_loss
            self.best_train_loss = train_loss
            self._save(self.best_cp_path, state, meta)
            saved.append(self.best_cp_path)
        return saved

    def on_train_end(self, state, epoch: int) -> str:   # train.py:317-318
        self._save(self.last_cp_path, state, {"epoch": epoch})
        return self.last_cp_path
