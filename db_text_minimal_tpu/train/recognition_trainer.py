"""Recognition model training: CTC and attention cross-entropy.

Capability the reference delegates entirely to the external clova repo (its
``models/recognition/best_norm_ED.pth`` is trained out-of-tree,
``Makefile:96``); provided here so the full OCR pipeline is trainable
end-to-end inside the framework. Jitted SPMD step like the detector trainer.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.recognition import RecognitionModel


class RecTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def ctc_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             label_lengths: jnp.ndarray) -> jnp.ndarray:
    """Mean CTC loss; blank index 0 (matches ``CTCLabelConverter``)."""
    n, t, _ = logits.shape
    logit_pad = jnp.zeros((n, t), jnp.float32)
    label_pad = (jnp.arange(labels.shape[1])[None, :]
                 >= label_lengths[:, None]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                             blank_id=0)
    return jnp.mean(per_seq)


def attn_loss(logits: jnp.ndarray, targets: jnp.ndarray,
              target_lengths: jnp.ndarray) -> jnp.ndarray:
    """Cross entropy over decode steps, masked past each sequence's EOS.
    ``targets`` holds [GO] at position 0 (AttnLabelConverter.encode); the
    decoder predicts positions 1..T."""
    t = logits.shape[1]
    gold = targets[:, 1:t + 1]
    mask = (jnp.arange(t)[None, :] < target_lengths[:, None]).astype(
        jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, gold[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def build_rec_train_step(model: RecognitionModel,
                         tx: optax.GradientTransformation):
    is_ctc = model.prediction == "CTC"

    def train_step(state: RecTrainState, images, targets, lengths,
                   lr: jnp.ndarray):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if is_ctc:
                logits, mutated = model.apply(
                    variables, images, train=True, mutable=["batch_stats"])
                loss = ctc_loss(logits, targets, lengths)
            else:
                logits, mutated = model.apply(
                    variables, images, text=targets, train=True,
                    mutable=["batch_stats"])
                loss = attn_loss(logits, targets, lengths)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt,
                             step=state.step + 1), loss

    return train_step


def build_rec_chain_step(model: RecognitionModel,
                         tx: optax.GradientTransformation):
    """K optimizer steps per jitted call: ``lax.scan`` of the single step
    over a stacked (K, B, ...) macro-batch, images arriving uint8 and
    normalized on device (``u8/127.5 - 1`` — bitwise the host
    ``rec_preprocess`` formula).

    Per-step dispatch is the wrong shape for the tunneled TPU runtime:
    every call pays ~70 ms RPC and the per-step ``float(loss)`` sync
    serializes on it, so a 950-step epoch spends >1 min in round-trips
    alone. One chained call amortizes the RPC over K steps and uploads
    4x fewer bytes (uint8 vs f32), the same ``compact_dtypes`` pattern
    the detection trainer ships its batches with.
    """
    step = build_rec_train_step(model, tx)

    def chain(state: RecTrainState, images_u8, targets, lengths, lr):
        def body(carry, xs):
            im, tg, ln = xs
            imf = im.astype(jnp.float32) / 127.5 - 1.0
            new, loss = step(carry, imf, tg, ln, lr)
            return new, loss

        return jax.lax.scan(body, state, (images_u8, targets, lengths))

    return chain


def init_rec_state(model: RecognitionModel, tx, seed: int = 0,
                   img_h: int = 32, img_w: int = 100,
                   channels: int = 1) -> RecTrainState:
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, img_h, img_w, channels)),
                           text=jnp.zeros((1, model.batch_max_length + 2),
                                          jnp.int32),
                           train=False)
    params = variables["params"]
    return RecTrainState(params=params,
                         batch_stats=variables.get("batch_stats", {}),
                         opt_state=tx.init(params),
                         step=jnp.zeros((), jnp.int32))
