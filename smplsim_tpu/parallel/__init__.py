from smplsim_tpu.parallel.mesh import (
    data_mesh,
    init_distributed,
    replicate,
    shard_batch,
    shard_env_states,
)
from smplsim_tpu.parallel.rollout import sharded_ppo_step, sharded_rollout

__all__ = [
    "data_mesh", "init_distributed", "replicate", "shard_batch",
    "shard_env_states", "sharded_rollout", "sharded_ppo_step",
]
