"""Device mesh + sharding strategies.

A new first-class subsystem with no reference counterpart — the reference is
strictly single-process single-device (SURVEY.md §2c: no torch.distributed,
no DataParallel, no communication backend). Here:

- 1-D ``data`` mesh for batch data parallelism (the only axis with a
  reference analogue: the batch dim of ``src/train.py:66-69``), gradients
  reduced by XLA-inserted collectives over ICI (replacing "no backend").
- Optional 2-D ``(data, model)`` mesh kept open for spatial/channel sharding
  of the conv net (named axes per SURVEY.md §5 long-context note).
- Multi-host: ``jax.distributed`` initialization over DCN + per-host data
  sharding (``data.DataLoader(num_hosts=..., host_id=...)``).

Under GSPMD, replicated params + batch-sharded inputs make XLA insert the
gradient ``psum`` automatically; these helpers only pin the shardings.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(num_devices: int | None = None, model_parallel: int = 1,
                devices=None) -> Mesh:
    """Build a ``(data,)`` or ``(data, model)`` mesh over the visible
    devices. ``num_devices=None`` uses all of them."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if model_parallel > 1:
        assert n % model_parallel == 0, (n, model_parallel)
        arr = np.array(devices).reshape(n // model_parallel, model_parallel)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.array(devices), (DATA_AXIS,))


def auto_data_mesh(batch_size: int, num_devices: int | None = None) -> Mesh:
    """Largest data mesh whose size divides the (per-host) batch size, so
    sharded batches always split evenly."""
    avail = num_devices or len(jax.devices())
    n = min(avail, batch_size)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return create_mesh(num_devices=max(n, 1))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch split over ``data`` and image ROWS split over ``model`` —
    the conv-net analogue of sequence parallelism (SURVEY.md §5: the
    detector has no sequence axis; spatial resolution is the scaling axis).
    Under GSPMD, convolutions over the sharded H dim get their halo
    exchanges inserted automatically by XLA; no manual collectives."""
    assert MODEL_AXIS in mesh.axis_names, "needs a (data, model) mesh"
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Device-put the array leaves of a host batch with the batch dim split
    over ``data``; non-array metadata (paths, annotations) passes through."""
    split = batch_sharding(mesh)
    mirror = replicated(mesh)
    data_size = mesh.shape[DATA_AXIS]

    def put(v):
        if isinstance(v, np.ndarray) and v.dtype != object:
            # batches that don't divide the data axis (e.g. the reference's
            # mandatory test_batch_size=1) are replicated instead
            s = split if v.shape[0] % data_size == 0 else mirror
            return jax.device_put(v, s)
        return v

    return {k: put(v) for k, v in batch.items()}


def replicate_state(tree, mesh: Mesh):
    """Replicate a params/opt-state pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """DCN multi-host bring-up (``jax.distributed``). No-op when the runtime
    is already initialized or single-host args are absent."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_batch_slice(global_batch_size: int) -> int:
    """Per-host batch size for a host-sharded input pipeline: the config's
    ``hps.batch_size`` is GLOBAL; each host's loader produces this slice
    (used by ``cli/train.py``; exercised by ``tests/test_multihost.py``)."""
    hosts = jax.process_count()
    assert global_batch_size % hosts == 0, (global_batch_size, hosts)
    return global_batch_size // hosts
