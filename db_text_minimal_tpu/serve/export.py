"""AOT model export for serving.

TPU-native counterpart of ``src/save_jit.py`` (TorchScript trace at
(1, 3, 640, 640)): exports the jitted eval-mode forward via ``jax.export``
into a serialized StableHLO artifact (plus the weights), loadable without
re-tracing Python model code — the same deploy-without-source property
TorchScript gave the reference's TorchServe handler
(``src/db_handler.py:57-71``).

Round-2 parity with live serving: the exported graph has a SYMBOLIC batch
dimension (one artifact serves any micro-batch size), takes uint8 input with
on-device Caffe-mean subtraction (4× smaller uploads), and uses the
weight-equivalent fused inference head — the same three optimizations the
live-model path runs. A ``.meta.json`` sidecar records the input contract.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def export_model(model, variables, out_path: str,
                 input_shape=(None, 640, 640, 3),
                 uint8_input: bool = True,
                 infer_mode: str = "flax",
                 prob_only: bool = False) -> str:
    """Serialize weights + exported forward. ``input_shape[0] = None`` means
    a symbolic batch dimension. With ``uint8_input`` the graph consumes raw
    uint8 images and subtracts the Caffe means on device (the preprocessing
    quirk of ``src/data_loaders.py:151-154`` baked into the artifact).

    ``infer_mode``: ``"flax"`` exports ``model.apply``; ``"folded"`` /
    ``"int8"`` export the folded inference forward (``models/quant_infer``:
    BN folded offline; int8 additionally quantizes the MXU-filling convs
    with dynamic activation scales) — ``variables`` must then be in
    FusedDBHead layout.
    The ``.params`` sidecar stores the folded tree. ``prob_only`` exports
    the (N, H, W, 1) prob-map-only graph (detection postprocess reads only
    channel 0). Returns the artifact path."""
    from jax import export as jax_export

    from ..utils import CAFFE_MEAN

    mean = jnp.asarray(CAFFE_MEAN, jnp.float32)
    if infer_mode not in ("flax", "folded", "int8"):
        raise ValueError(f"unknown infer_mode: {infer_mode!r}")
    if infer_mode != "flax":
        from ..models.quant_infer import (prepare_quant_params,
                                          quant_dbnet_forward)

        # stem_s2d / deconv_d2s measured negative on hardware — off
        variables = prepare_quant_params(
            jax.device_get(variables), skip=(),
            min_out_channels=128 if infer_mode == "int8" else 10**9)

    def forward(v, x):
        if uint8_input:
            x = x.astype(jnp.float32) - mean
        if infer_mode != "flax":
            return quant_dbnet_forward(v, x, prob_only=prob_only)
        y = model.apply(v, x, train=False)
        return y[..., :1] if prob_only else y

    if input_shape[0] is None:
        batch = jax_export.symbolic_shape("b")[0]
        shape = (batch,) + tuple(input_shape[1:])
    else:
        shape = tuple(input_shape)
    dtype = jnp.uint8 if uint8_input else jnp.float32
    exported = jax_export.export(jax.jit(forward))(
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     variables),
        jax.ShapeDtypeStruct(shape, dtype))
    blob = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    with open(out_path + ".params", "wb") as f:
        f.write(serialization.to_bytes(
            jax.tree.map(np.asarray, variables)))
    with open(out_path + ".meta.json", "w") as f:
        json.dump({"uint8_input": uint8_input,
                   "symbolic_batch": input_shape[0] is None,
                   "input_shape": list(input_shape),
                   "infer_mode": infer_mode,
                   "prob_only": prob_only}, f)
    return out_path


def load_exported(path: str):
    """Load a serialized export + params; returns ``infer(x) -> preds``.
    ``infer`` accepts uint8 images when the artifact was exported with
    ``uint8_input`` (see the ``.meta.json`` sidecar), f32 otherwise."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    with open(path + ".params", "rb") as f:
        variables = serialization.msgpack_restore(f.read())
    meta = {"uint8_input": False}
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            meta = json.load(f)
    dtype = jnp.uint8 if meta.get("uint8_input") else jnp.float32

    def infer(x):
        return exported.call(variables, jnp.asarray(x, dtype))

    infer.meta = meta
    return infer
