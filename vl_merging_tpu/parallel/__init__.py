from .mesh import (  # noqa: F401
    DATA_AXIS, FSDP_AXIS, make_mesh, batch_sharding, replicated,
    param_shardings, shard_params, shard_batch, initialize_multihost,
)
