"""Device mesh and sharding helpers.

Replaces the reference's NCCL/DDP stack (SURVEY.md §2.6): instead of
`torch.distributed.launch` + DistributedDataParallel + explicit all_reduce /
all_gather_object (`train_debug.py:20-22`, `run_gun.py:63-72,271,433-437`), we
lay out a `jax.sharding.Mesh` with a `data` axis (and a `model` axis reserved
for tensor sharding of the vocab projection) and let XLA insert the gradient
all-reduce when a jitted step consumes batch-sharded inputs and produces
replicated parameters. Collectives ride ICI; multi-host DCN is handled by the
same mesh.

There is no hard-coded world size anywhere (the reference hard-codes 4 at
run_gun.py:270 — deliberately not copied).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n_total = devices.size
    if n_data is None or n_data < 0:
        n_data = n_total // n_model
    assert n_data * n_model == n_total, (
        f"mesh {n_data}x{n_model} != {n_total} devices"
    )
    return Mesh(devices.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a host batch with the leading axis sharded over `data`."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
