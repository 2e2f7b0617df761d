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


def step_pd(model: RobotModel, state: PhysicsState, target: jax.Array):
    """One substep under stable-PD control toward joint target (nu,).

    Fuses the controller's and the dynamics' mass-matrix work (the reference
    computes M twice per substep — once in StablePDController.control, once
    inside mj_step). Returns (state', torque, StepInfo).
    """
    from smplsim_tpu.physics import control as ctrl_mod

    kin = kinematics.fk(model, state.qpos)
    M = dynamics.mass_matrix(model, kin)
    tau = ctrl_mod.stable_pd_torque(model, kin, M, state.qpos, state.qvel, target)
    qfrc = (
        dynamics.actuator_forces(model, tau)
        + dynamics.passive_forces(model, state.qvel)
        - dynamics.bias_forces(model, kin, state.qvel)
    )
    chol = jnp.linalg.cholesky(M)
    qacc_smooth = jax.scipy.linalg.cho_solve((chol, True), qfrc)
    smooth = dynamics.Smooth(M=M, chol=chol, qfrc_smooth=qfrc, qacc_smooth=qacc_smooth)
    efc = constraints.make_efc(model, kin, state.qpos, state.qvel)
    sol = solver.solve_constraints(model, smooth, efc)
    qpos, qvel = integrator.euler_step(
        model, state.qpos, state.qvel, sol.qacc, model.timestep
    )
    info = StepInfo(kin=kin, smooth=smooth, efc=efc, sol=sol)
    return PhysicsState(qpos=qpos, qvel=qvel), tau, info


def control_step(
    model: RobotModel,
    state: PhysicsState,
    action: jax.Array,
    control_freq_inv: int = 15,
    control_mode: str = "uhc_pd",
    power_scale: float = 1.0,
):
    """One control step = control_freq_inv substeps, torque recomputed per
    substep (reference physics_step, humanoid_env.py:439-453).

    Returns (state', last StepInfo, power (sum |tau * qvel| over substeps)).
    """
    from smplsim_tpu.physics import control as ctrl_mod

    def substep(carry, _):
        st, power = carry
        if control_mode == "uhc_pd":
            target = ctrl_mod.pd_target_from_action(model, action)
            st2, tau, info = step_pd(model, st, target)
        elif control_mode == "torque":
            tau = ctrl_mod.torque_ctrl(model, action, power_scale)
            st2, info = step(model, st, tau)
        elif control_mode == "default":
            tau = action
            st2, info = step(model, st, tau)
        else:
            raise NotImplementedError(control_mode)
        power = power + jnp.sum(jnp.abs(tau * st.qvel[6:]))
        return (st2, power), info

    (state, power), infos = jax.lax.scan(
        substep, (state, jnp.zeros((), state.qpos.dtype)), None,
        length=control_freq_inv,
    )
    last_info = jax.tree.map(lambda x: x[-1], infos)
    return state, last_info, power
