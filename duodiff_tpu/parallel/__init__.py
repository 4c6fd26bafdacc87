from duodiff_tpu.parallel.mesh import (
    create_mesh,
    create_hybrid_mesh,
    batch_sharding,
    fsdp_shard_params,
    param_sharding_rules,
    shard_params,
    opt_state_shardings,
    sampling_mesh,
    setup_sampling_sharding,
    replicate,
)

__all__ = [
    "opt_state_shardings",
    "create_mesh",
    "create_hybrid_mesh",
    "batch_sharding",
    "fsdp_shard_params",
    "param_sharding_rules",
    "shard_params",
    "sampling_mesh",
    "setup_sampling_sharding",
    "replicate",
]
