"""Host->device prefetching.

The reference overlaps host IO with GPU compute via DataLoader worker
processes + pinned memory (utils/data.py:115-130). The TPU equivalent is a
small background thread that stages the NEXT batch onto the device (optionally
sharded over the mesh data axis) while the current step runs — `device_put` is
async, so the copy overlaps compute; the thread merely keeps the iterator ahead.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax
import numpy as np

from dlsg_tpu.parallel.mesh import batch_sharding


_SENTINEL = object()


def stage_cast(array, stage_dtype):
    """The single implementation of the `input_stage_dtype` staging policy:
    cast one float feature array on the host before device_put, halving
    host->device bytes for transfer-bound (remote/relay) deployments.
    Numerics are unchanged under compute_dtype=bfloat16 (every consumer casts
    before the MXU); see DLSGConfig.input_stage_dtype for the fp32-compute
    caveat. Used by prefetch_to_device, evaluation.evaluate, and
    serve.Captioner so the policy can't drift between paths."""
    if stage_dtype is None:
        return array
    return np.asarray(array).astype(stage_dtype)


def prefetch_to_device(
    batch_iter: Iterator[dict],
    mesh=None,
    buffer_size: int = 2,
    keys=("frames", "regions", "captions", "lengths"),
    stage_dtype=None,
    cast_keys=("frames", "regions"),
) -> Iterator[dict]:
    """Wrap a host batch iterator; yields device-resident batches one step ahead.

    `stage_dtype` (e.g. jnp.bfloat16, cfg.stage_dtype) casts the float feature
    fields in `cast_keys` on the host before device_put — halving the
    host->device bytes for transfer-bound (remote/relay) deployments. Numerics
    are unchanged under compute_dtype=bfloat16 (consumers cast anyway).

    Multi-host: each process's local batch is stitched into a GLOBAL
    data-sharded jax.Array (`make_array_from_process_local_data`) — the SPMD
    replacement for DistributedSampler + DDP input handling (utils/data.py:121).
    """
    sharding = batch_sharding(mesh) if mesh is not None else None
    multihost = jax.process_count() > 1

    def _stage(k, v):
        if k in cast_keys:
            v = stage_cast(v, stage_dtype)
        if sharding is None:
            return jax.device_put(v)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, np.asarray(v))
        return jax.device_put(v, sharding)

    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)

    def producer():
        try:
            for batch in batch_iter:
                staged = {
                    k: _stage(k, v) for k, v in batch.items() if k in keys
                }
                # keep host-only fields (video ids, valid masks) unstaged
                for k, v in batch.items():
                    if k not in staged:
                        staged[k] = v
                q.put(staged)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
