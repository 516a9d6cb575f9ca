"""SPMD scaling: device meshes, sharding rules, batch/param placement."""

from e2e_parking_carla_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)
