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


def globalize_batch(batch: dict, mesh: Mesh) -> dict:
    """Assemble each host's local batch into one GLOBAL data-sharded array.

    Multi-host SPMD (replacing the reference's DistributedSampler + DDP,
    utils/data.py:121-122): every process loads a disjoint per-host slice
    (data/loader.py shard_index/num_shards) and
    `jax.make_array_from_process_local_data` stitches the slices into a global
    jax.Array of shape [local_B * process_count, ...] laid out over the mesh's
    data axis, which jitted steps then consume. Single-process: a no-op (the
    jit wrapper's with_sharding_constraint already places the numpy batch).
    """
    if jax.process_count() == 1:
        return batch
    sh = batch_sharding(mesh)
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in batch.items()
    }


# Tensor-parallel rules: param-path substring -> PartitionSpec. The vocab
# projection (decoder word_restore) is by far the largest matrix
# (decode_hidden x |V|); column-sharding it over `model` splits both the
# weight memory and the per-step logits matmul, with XLA inserting the
# all-gather for the logits. Everything else stays replicated (the reference
# model is small enough that DP is the dominant axis, matching its DDP-only
# design — SURVEY.md §2.6).
TP_RULES = (
    ("word_restore/kernel", P(None, MODEL_AXIS)),
    ("word_restore/bias", P(MODEL_AXIS)),
)


def param_sharding_specs(params, rules=TP_RULES, mesh: Optional[Mesh] = None):
    """PartitionSpec pytree for a params tree (default: replicate).

    When `mesh` is given, a rule only applies if every sharded dim of the
    leaf divides evenly by its mesh axis size — otherwise that leaf falls
    back to replicated (e.g. a tiny test vocab of 39 on model=2; XLA requires
    even chunks for device_put shardings)."""

    def divisible(leaf, spec):
        if mesh is None:
            return True
        shape = getattr(leaf, "shape", ())
        for i, axis in enumerate(spec):
            if axis is None or i >= len(shape):
                continue
            size = mesh.shape[axis] if isinstance(axis, str) else int(
                np.prod([mesh.shape[a] for a in axis])
            )
            if shape[i] % size != 0:
                return False
        return True

    def spec_for(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        for sub, spec in rules:
            if sub in name and divisible(leaf, spec):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, rules=TP_RULES):
    """device_put params with TP rules applied (replicated otherwise)."""
    specs = param_sharding_specs(params, rules, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_train_state(state, mesh: Mesh, rules=TP_RULES):
    """device_put a whole TrainState with the TP rules applied to every
    param-shaped leaf — the params AND the optimizer's Adam mu/nu mirrors,
    which must shard exactly like their parameters (their tree paths contain
    the same `word_restore/...` components, so the same substring rules hit).
    Scalars (step, lr hyperparams, counts) come out replicated. Once the state
    is laid out this way, the jitted train step propagates the sharding:
    XLA partitions the vocab matmul over `model` and keeps the Adam update
    local to each shard — no resharding per step."""
    specs = param_sharding_specs(state, rules, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )
