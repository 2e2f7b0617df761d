from smplsim_tpu.models.spec import (
    RobotModel, GEOM_SPHERE, GEOM_CAPSULE, GEOM_BOX, stack_models,
)
from smplsim_tpu.models.mjcf import parse_mjcf, parse_mjcf_file

__all__ = [
    "RobotModel",
    "stack_models",
    "GEOM_SPHERE",
    "GEOM_CAPSULE",
    "GEOM_BOX",
    "parse_mjcf",
    "parse_mjcf_file",
]
