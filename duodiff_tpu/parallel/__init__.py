from duodiff_tpu.parallel.mesh import (
    create_mesh,
    create_hybrid_mesh,
    batch_sharding,
    param_sharding_rules,
    shard_params,
    replicate,
)

__all__ = [
    "create_mesh",
    "create_hybrid_mesh",
    "batch_sharding",
    "param_sharding_rules",
    "shard_params",
    "replicate",
]
