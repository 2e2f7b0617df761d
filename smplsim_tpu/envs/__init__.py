from smplsim_tpu.envs.base import EnvConfig, EnvState, HumanoidEnv
from smplsim_tpu.envs.tasks import (
    TASKS,
    GetupConfig,
    HumanoidGetup,
    HumanoidReach,
    HumanoidSpeed,
    ReachConfig,
    SpeedConfig,
)

__all__ = [
    "EnvConfig", "EnvState", "HumanoidEnv",
    "TASKS", "GetupConfig", "HumanoidGetup", "HumanoidReach",
    "HumanoidSpeed", "ReachConfig", "SpeedConfig",
]
