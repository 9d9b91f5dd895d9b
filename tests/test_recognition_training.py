"""Recognition training tests: CTC and attention losses decrease on a tiny
synthetic glyph dataset (rendered digits)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from db_text_minimal_tpu.models.recognition import (AttnLabelConverter,
                                                    CTCLabelConverter,
                                                    RecognitionModel)
from db_text_minimal_tpu.train.recognition_trainer import (
    build_rec_train_step, init_rec_state)


def _render_word(rng, text: str):
    import cv2

    img = np.zeros((32, 100), np.uint8)
    cv2.putText(img, text, (4, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.8, 255, 2)
    noise = rng.randint(0, 30, img.shape, dtype=np.uint8)
    img = cv2.add(img, noise)
    return img.astype(np.float32)[None, :, :, None] / 127.5 - 1.0


def _batch(rng, converter, words, max_len=25):
    imgs = np.concatenate([_render_word(rng, w) for w in words])
    targets, lengths = converter.encode(words, max_len)
    return (jnp.asarray(imgs), jnp.asarray(targets), jnp.asarray(lengths))


@pytest.mark.parametrize("prediction", ["CTC", "Attn"])
def test_recognition_loss_decreases(rng, prediction):
    converter = (CTCLabelConverter if prediction == "CTC"
                 else AttnLabelConverter)("0123456789")
    model = RecognitionModel(num_class=len(converter.character),
                             feature_extraction="VGG",
                             sequence_modeling="None",
                             prediction=prediction, output_channel=128,
                             hidden_size=64)
    tx = optax.scale_by_adam()
    state = init_rec_state(model, tx)
    step = jax.jit(build_rec_train_step(model, tx))

    words = ["01", "23", "45", "67"]
    images, targets, lengths = _batch(rng, converter, words)
    losses = []
    for _ in range(15):
        state, loss = step(state, images, targets, lengths,
                           jnp.float32(1e-3))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.8, losses
