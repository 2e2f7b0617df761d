"""The full physics step: the TPU-native mujoco.mj_step equivalent.

Single-env, pure-functional; batch via vmap, time via lax.scan. One substep =
FK -> smooth dynamics -> constraint assembly -> dual solve -> Euler integrate
(mirrors the per-substep loop the reference runs through MuJoCo at 450 Hz,
smpl_sim/envs/humanoid_env.py:439-453).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from smplsim_tpu.models.spec import RobotModel
from smplsim_tpu.physics import constraints, dynamics, integrator, kinematics, solver


class PhysicsState(struct.PyTreeNode):
    qpos: jax.Array
    qvel: jax.Array


class StepInfo(NamedTuple):
    kin: kinematics.Kin
    smooth: dynamics.Smooth
    efc: constraints.EFC
    sol: solver.ConstraintSolution


def init_state(model: RobotModel) -> PhysicsState:
    return PhysicsState(qpos=model.qpos0, qvel=jnp.zeros(model.nv, model.qpos0.dtype))


def forward(model: RobotModel, state: PhysicsState, ctrl: jax.Array) -> StepInfo:
    """Compute accelerations + constraint forces at the current state."""
    kin = kinematics.fk(model, state.qpos)
    smooth = dynamics.smooth_dynamics(model, kin, state.qvel, ctrl)
    efc = constraints.make_efc(model, kin, state.qpos, state.qvel)
    sol = solver.solve_constraints(model, smooth, efc)
    return StepInfo(kin=kin, smooth=smooth, efc=efc, sol=sol)


def step(model: RobotModel, state: PhysicsState, ctrl: jax.Array):
    """One physics substep (mj_step equivalent). Returns (state', StepInfo)."""
    info = forward(model, state, ctrl)
    qpos, qvel = integrator.euler_step(
        model, state.qpos, state.qvel, info.sol.qacc, model.timestep
    )
    return PhysicsState(qpos=qpos, qvel=qvel), info
