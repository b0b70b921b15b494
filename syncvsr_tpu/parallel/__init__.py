"""Device-mesh construction and sharding helpers (jit + NamedSharding SPMD)."""

from syncvsr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    batch_shardings,
    create_mesh,
    host_local_batch,
    replicated,
    shard_batch,
    shard_state,
    state_shardings,
)
