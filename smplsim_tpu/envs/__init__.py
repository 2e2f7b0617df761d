from smplsim_tpu.envs.base import EnvConfig, EnvState, HumanoidEnv
from smplsim_tpu.envs.domain_rand import (
    DomainRandConfig,
    DomainRandEnv,
    NoiseSpec,
    randomize_model,
)
from smplsim_tpu.envs.nv import BodyHistory, NvConfig, NvHumanoid
from smplsim_tpu.envs.tasks import (
    TASKS,
    GetupConfig,
    HumanoidGetup,
    HumanoidReach,
    HumanoidSpeed,
    ReachConfig,
    SpeedConfig,
)
from smplsim_tpu.envs.vector import GymVectEnv

__all__ = [
    "EnvConfig", "EnvState", "HumanoidEnv",
    "TASKS", "GetupConfig", "HumanoidGetup", "HumanoidReach",
    "HumanoidSpeed", "ReachConfig", "SpeedConfig",
    "NvConfig", "NvHumanoid", "BodyHistory",
    "DomainRandConfig", "DomainRandEnv", "NoiseSpec", "randomize_model",
    "GymVectEnv",
]
