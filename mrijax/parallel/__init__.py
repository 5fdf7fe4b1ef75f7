"""Device meshes and SPMD parallelism (replaces DataParallel/DDP-NCCL)."""

from mrijax.parallel.mesh import (
    make_mesh,
    data_sharding,
    global_put,
    replicated_sharding,
    shard_batch,
)
from mrijax.parallel.fsdp import (
    fsdp_shardings,
    fsdp_step,
    shard_train_state,
)
from mrijax.parallel.sampling import sharded_sample
from mrijax.parallel.sequence import sequence_parallel_attention
from mrijax.parallel.multihost import (
    initialize,
    broadcast_from_host0,
    all_processes_agree,
    any_process_flagged,
)

__all__ = [
    "make_mesh",
    "data_sharding",
    "global_put",
    "replicated_sharding",
    "shard_batch",
    "fsdp_shardings",
    "fsdp_step",
    "shard_train_state",
    "sharded_sample",
    "sequence_parallel_attention",
    "initialize",
    "broadcast_from_host0",
    "all_processes_agree",
    "any_process_flagged",
]
