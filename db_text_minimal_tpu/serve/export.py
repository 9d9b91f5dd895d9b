"""AOT model export for serving.

TPU-native counterpart of ``src/save_jit.py`` (TorchScript trace at
(1, 3, 640, 640)): exports the jitted eval-mode forward via ``jax.export``
into a serialized StableHLO artifact (plus the weights), loadable without
re-tracing Python model code — the same deploy-without-source property
TorchScript gave the reference's TorchServe handler
(``src/db_handler.py:57-71``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def export_model(model, variables, out_path: str,
                 input_shape=(1, 640, 640, 3)) -> str:
    """Serialize weights + exported forward. Returns the artifact path."""
    from jax import export as jax_export

    def forward(v, x):
        return model.apply(v, x, train=False)

    exported = jax_export.export(jax.jit(forward))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     variables),
        jax.ShapeDtypeStruct(input_shape, jnp.float32))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    with open(out_path + ".params", "wb") as f:
        f.write(serialization.to_bytes(
            jax.tree.map(np.asarray, variables)))
    return out_path


def load_exported(path: str):
    """Load a serialized export + params; returns ``infer(x) -> preds``."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(path + ".params", "rb") as f:
        variables = serialization.msgpack_restore(f.read())

    def infer(x):
        return exported.call(variables, jnp.asarray(x, jnp.float32))

    return infer
