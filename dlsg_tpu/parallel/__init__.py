"""SPMD parallelism: device mesh + sharding helpers."""

from dlsg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
