"""Semi-implicit Euler integration (MuJoCo's default integrator semantics)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from smplsim_tpu import transforms as T
from smplsim_tpu.models.spec import RobotModel


def integrate_pos(model: RobotModel, qpos: jax.Array, qvel: jax.Array, dt) -> jax.Array:
    """qpos advanced by qvel over dt (quaternion for the free root)."""
    pos = qpos[0:3] + dt * qvel[0:3]
    quat = T.quat_integrate(qpos[3:7], qvel[3:6], dt)
    hinge = qpos[7:] + dt * qvel[6:]
    return jnp.concatenate([pos, quat, hinge])


def euler_step(model: RobotModel, qpos: jax.Array, qvel: jax.Array, qacc: jax.Array, dt):
    """Semi-implicit Euler: velocity first, then position with new velocity."""
    qvel_new = qvel + dt * qacc
    qpos_new = integrate_pos(model, qpos, qvel_new, dt)
    return qpos_new, qvel_new
