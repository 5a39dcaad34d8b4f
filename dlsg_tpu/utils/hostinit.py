"""Host-side parameter initialization for relay-attached accelerators.

`flax.Module.init` executes the model op by op (eager); on a remote-relay TPU
every tiny op is a network round trip — measured ~400 s of pure init before a
single train step at MSR-VTT dimensions. Parameter shapes are batch-size
independent, so init can run at batch 1 on the LOCAL CPU backend in seconds,
and one `device_put` stages the finished tree on the accelerator.

The reference has no equivalent (local-CUDA init is free, run_gun.py:73-90);
this is a TPU-environment concern only. Multi-host processes keep the eager
path (placement of host-local trees onto a global mesh is the prefetcher's
make_array_from_process_local_data job, not device_put's).

CRITICAL placement note: arrays created under `jax.default_device(cpu)` are
COMMITTED to CPU, and `jax.device_put(tree)` with no target is a no-op for
committed arrays — a jitted step would then re-ship the whole tree through
the relay on EVERY call (measured: 10.9 s/batch instead of 31 ms). Always
pass the result through `place_replicated` (or an explicit sharding) before
using it in a jitted function.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensure_local_cpu_backend() -> bool:
    """Make `jax.devices("cpu")` usable alongside a pinned accelerator platform.

    Relay environments pin JAX_PLATFORMS to the accelerator plugin (e.g.
    `axon`), which makes the CPU backend unavailable and silently downgrades
    `init_on_host` to eager on-device init — re-paying the ~400 s of relay
    RTTs it exists to remove. Appending `,cpu` keeps the accelerator as the
    default platform (priority = list order) while restoring the local CPU
    backend. Must run BEFORE JAX initializes its backends (first
    `jax.devices()`/computation); afterwards it can only report availability.
    Returns True when a CPU backend is available. Call this at entry points
    (cli commands, Captioner.from_checkpoint, bench) — not at import.
    """
    import os

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass  # backends already initialized — too late to extend the list
    try:
        return len(jax.devices("cpu")) > 0
    except RuntimeError:
        return False


def init_on_host(model, rng, *args, **kwargs):
    """`model.init(rng, *args)` on the local CPU backend at batch size 1.

    Leading-axis args are sliced to their first row (param shapes don't
    depend on batch). Returns a CPU-committed variables tree when a CPU
    backend is available (see module note: callers must place it), else
    falls back to eager init on the default backend — still at batch 1,
    which already cuts the relay-RTT bytes.

    Param values are bit-identical across backends (XLA's threefry PRNG is
    deterministic by spec), so a host-inited run matches a device-inited one.
    """
    small = tuple(
        np.asarray(a)[:1] if getattr(a, "ndim", 0) >= 1 else a for a in args
    )
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return model.init(rng, *small, **kwargs)
    with jax.default_device(cpu):
        return model.init(rng, *small, **kwargs)


def place_replicated(tree, mesh: Mesh | None = None):
    """Stage a host/CPU-resident pytree onto the accelerator.

    mesh None -> the default device; else replicated over every mesh device
    (tensor-parallel leaves are re-laid afterwards by
    parallel.mesh.shard_train_state). Single-process meshes only — multi-host
    callers keep their existing placement path.
    """
    if mesh is None:
        return jax.device_put(tree, jax.devices()[0])
    return jax.device_put(tree, NamedSharding(mesh, P()))
