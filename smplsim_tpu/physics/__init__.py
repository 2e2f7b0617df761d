from smplsim_tpu.physics.kinematics import fk, body_quats, body_velocities, Kin
from smplsim_tpu.physics.dynamics import (
    mass_matrix,
    bias_forces,
    smooth_dynamics,
    Smooth,
)
from smplsim_tpu.physics.integrator import euler_step, integrate_pos

__all__ = [
    "fk",
    "body_quats",
    "body_velocities",
    "Kin",
    "mass_matrix",
    "bias_forces",
    "smooth_dynamics",
    "Smooth",
    "euler_step",
    "integrate_pos",
]
