from agents_tpu.parallel.mesh_utils import (
    batch_sharded,
    create_mesh,
    replicated,
    shard_loop_state,
)

__all__ = ["batch_sharded", "create_mesh", "replicated", "shard_loop_state"]
