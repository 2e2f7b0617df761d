"""Controllers: stable-PD, torque, PD/PID — TPU-native versions of
smpl_sim/envs/controllers.py.

The stable-PD law (Tan et al., https://www.jie-tan.net/project/spd.pdf), as
configured by the reference (controllers.py:142-190):

    qpos_err = [0_6; q + dt*qv - q*]
    qacc = (M + dt*diag(Kd))^-1 (-C - Kp qpos_err - Kd qv)
    tau  = -Kp qpos_err[6:] - Kd (qv + dt*qacc)[6:],  clipped to torque_lim

where M includes armature and C is the full bias (Coriolis + gravity). Gains
kp/kd live on the RobotModel (jkp/jkd from the reference GAINS table).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smplsim_tpu.physics import linalg

from smplsim_tpu.models.spec import RobotModel


def pd_target_from_action(model: RobotModel, action: jax.Array) -> jax.Array:
    """action in [-1,1]^nu -> joint-position setpoint (reference scaling)."""
    return action * model.pd_action_scale + model.pd_action_offset


def stable_pd_torque(
    model: RobotModel,
    M: jax.Array,
    C: jax.Array,
    qpos: jax.Array,
    qvel: jax.Array,
    target: jax.Array,
    kp_scale: float = 1.0,
    kd_scale: float = 1.0,
) -> jax.Array:
    """Stable-PD torque (nu,) from an explicit mass matrix M and bias C.

    The reference controller reads mjData.qM / qfrc_bias at call time
    (controllers.py:177-181) — after an mj_step those are STALE, evaluated at
    the previous substep's pre-integration state. Callers must pass M and C
    with exactly that lifecycle (engine.control_step carries them through its
    scan); qpos/qvel here are the CURRENT state, as in the reference.
    """
    dt = model.timestep
    kp = jnp.concatenate([jnp.zeros(6, M.dtype), model.jkp * kp_scale])
    kd = jnp.concatenate([jnp.zeros(6, M.dtype), model.jkd * kd_scale])
    qpos_err = jnp.concatenate(
        [jnp.zeros(6, M.dtype), qpos[7:] + qvel[6:] * dt - target]
    )
    rhs = -C - kp * qpos_err - kd * qvel
    H = M + jnp.diag(kd) * dt
    _, qacc = linalg.cho_factor_solve(H, rhs)
    tau = -(model.jkp * kp_scale) * qpos_err[6:] - (model.jkd * kd_scale) * (
        qvel[6:] + qacc[6:] * dt
    )
    return jnp.clip(tau, -model.torque_lim, model.torque_lim)


def torque_ctrl(model: RobotModel, action: jax.Array, power_scale: float = 1.0) -> jax.Array:
    """SimpleTorqueController: scale+clip (controllers.py:6-47)."""
    tau = action * power_scale * model.torque_lim
    return jnp.clip(tau, -model.torque_lim, model.torque_lim)


class PIDState(NamedTuple):
    """Carried state of SimplePID (pure-functional port of the reference's
    stateful object, controllers.py:193-262)."""

    proportional: jax.Array  # (nu,) running P term (proportional-on-measurement)
    integral: jax.Array      # (nu,)
    last_input: jax.Array    # (nu,) previous feedback (qpos[7:])
    last_error: jax.Array    # (nu,)
    primed: jax.Array        # () bool: last_* valid (False on the first call)


def simple_pid_init(nu: int, dtype=jnp.float32) -> PIDState:
    z = jnp.zeros(nu, dtype)
    return PIDState(z, z, z, z, jnp.zeros((), bool))


def simple_pid_torque(
    model: RobotModel,
    state: PIDState,
    qpos: jax.Array,
    action: jax.Array,
    jki: jax.Array | None = None,
    proportional_on_measurement: bool = False,
    differential_on_measurement: bool = False,
) -> tuple[jax.Array, PIDState]:
    """SimplePID law (reference controllers.py:193-262, itself after
    m-lundberg/simple-pid). Returns (tau, state').

    First call semantics match the reference: d_input and d_error are zero
    when last_* is unset (the `primed` flag replaces the None checks).
    Output and integral are clamped to torque_lim (anti-windup).
    """
    dt = model.timestep
    lim = model.torque_lim
    kp, kd = model.jkp, model.jkd
    ki = jnp.zeros_like(kp) if jki is None else jki

    feedback = qpos[7:]
    setpoint = pd_target_from_action(model, action)
    error = setpoint - feedback
    d_input = jnp.where(state.primed, feedback - state.last_input, 0.0)
    d_error = jnp.where(state.primed, error - state.last_error, 0.0)

    if proportional_on_measurement:
        proportional = state.proportional - kp * d_input
    else:
        proportional = kp * error
    integral = jnp.clip(state.integral + ki * error * dt, -lim, lim)
    if differential_on_measurement:
        derivative = -kd * d_input / dt
    else:
        derivative = kd * d_error / dt

    tau = jnp.clip(proportional + integral + derivative, -lim, lim)
    new_state = PIDState(
        proportional=proportional,
        integral=integral,
        last_input=feedback,
        last_error=error,
        primed=jnp.ones((), bool),
    )
    return tau, new_state


def pid_torque(
    model: RobotModel,
    qpos: jax.Array,
    qvel: jax.Array,
    target: jax.Array,
    integral: jax.Array,
    jki: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """PIDController law (controllers.py:265-349). Returns (tau, integral')."""
    dt = model.timestep
    err = qpos[7:] - target
    integral = jnp.clip(integral + err * dt, -model.torque_lim, model.torque_lim)
    ki = jnp.zeros_like(model.jkp) if jki is None else jki
    tau = -model.jkp * err - model.jkd * qvel[6:] - ki * integral
    return jnp.clip(tau, -model.torque_lim, model.torque_lim), integral
