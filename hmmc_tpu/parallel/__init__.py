from hmmc_tpu.parallel.mesh import (
    MeshSpec, batch_sharding, make_mesh, param_shardings, replicated,
    shard_batch, shard_opt_state, shard_params, video_sharding,
    zero_opt_shardings)

__all__ = ["MeshSpec", "make_mesh", "batch_sharding", "replicated",
           "shard_batch", "param_shardings", "shard_params",
           "video_sharding", "zero_opt_shardings", "shard_opt_state"]
