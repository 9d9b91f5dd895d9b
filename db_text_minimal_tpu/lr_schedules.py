"""Learning-rate schedules.

TPU-native rebuild of ``src/lr_schedulers.py`` (``WarmupPolyLR`` :4-48) plus
the torch ``ReduceLROnPlateau`` the reference's default config selects
(``example_config.yaml:18-21``, stepped on test loss at
``src/train.py:310-311``).

``warmup_poly_lr`` is a pure optax-style ``step -> lr`` schedule;
``ReduceLROnPlateau`` is host-side state (it reacts to an epoch-level metric,
so it cannot be a pure step schedule) feeding a scale factor into the
optimizer via ``optax.scale_by_learning_rate`` injection.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def warmup_poly_lr(base_lr: float, target_lr: float = 0.0,
                   max_iters: int = 0, power: float = 0.9,
                   warmup_factor: float = 1.0 / 3, warmup_iters: int = 500,
                   warmup_method: str = "linear"):
    """``src/lr_schedulers.py:4-48``. Linear/constant warmup then polynomial
    decay ``(1 − T/N)^power``. Faithfully reproduces the reference quirk that
    ``max_iters`` defaults to 0 when the trainer instantiates it with only
    ``warmup_iters`` (``src/train.py:128-129``): past warmup the decay base
    goes negative; we clamp the factor to 0 rather than emit NaNs."""
    if warmup_method not in ("constant", "linear"):
        raise ValueError(
            "Only 'constant' or 'linear' warmup_method accepted got {}".format(
                warmup_method))

    def schedule(step):
        # numpy on purpose: the trainer evaluates this on HOST every step
        # and feeds the float into the jitted step — eager jnp here costs
        # ~10 device dispatches/step, each paying the tunnel RPC on TPU
        step = np.float32(step)
        if warmup_method == "constant":
            wf = warmup_factor
        else:
            alpha = step / max(warmup_iters, 1)
            wf = warmup_factor * (1 - alpha) + alpha
        warmup_lr = target_lr + (base_lr - target_lr) * wf

        n = max(max_iters - warmup_iters, 1)
        t = step - warmup_iters
        factor = np.clip(1.0 - t / n, 0.0, 1.0) ** power
        decay_lr = target_lr + (base_lr - target_lr) * factor
        return np.where(step < warmup_iters, warmup_lr, decay_lr)

    return schedule


@dataclass
class ReduceLROnPlateau:
    """torch ``ReduceLROnPlateau(mode='min', factor, patience)`` equivalent
    (``src/train.py:130-136``): call ``step(metric)`` once per epoch; read
    ``scale`` (multiplier on the base lr) from a host-side variable that the
    jitted train step consumes as an input array."""

    factor: float = 0.2
    patience: int = 4
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = field(default=np.inf)
    num_bad_epochs: int = 0
    scale: float = 1.0

    def step(self, metric: float) -> float:
        metric = float(metric)
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.scale = max(self.scale * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.scale
