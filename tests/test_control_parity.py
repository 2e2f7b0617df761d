"""Stable-PD control parity: our fused control_step vs the reference control
loop (StablePDController math on MuJoCo internals + mj_step at 450 Hz)."""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest
from scipy.linalg import cho_factor, cho_solve

from smplsim_tpu.models import mjcf
from smplsim_tpu.physics import engine
from tests.conftest import REFERENCE_XML


@pytest.fixture(scope="module")
def setup():
    with open(REFERENCE_XML) as f:
        xml = f.read()
    model = mjcf.parse_mjcf(xml, dtype=jnp.float64).replace(
        timestep=jnp.float64(1.0 / 450.0)
    )
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_model.opt.timestep = 1.0 / 450.0
    return model, mj_model


def reference_spd_torque(model, mj_model, mj_data, target):
    """The reference stable-PD law verbatim (controllers.py:142-190)."""
    nv = mj_model.nv
    jkp, jkd = np.asarray(model.jkp), np.asarray(model.jkd)
    qp, qv = mj_data.qpos.copy(), mj_data.qvel.copy()
    dt = mj_model.opt.timestep
    kp = np.zeros(nv)
    kd = np.zeros(nv)
    kp[6:], kd[6:] = jkp, jkd
    qpos_err = np.concatenate((np.zeros(6), qp[7:] + qv[6:] * dt - target))
    M = np.zeros((nv, nv))
    mujoco.mj_fullM(mj_model, mj_data, M)
    qacc = cho_solve(
        cho_factor(M + np.diag(kd) * dt),
        -mj_data.qfrc_bias.copy() - kp * qpos_err - kd * qv,
    )
    tau = -jkp * qpos_err[6:] - jkd * (qv + qacc * dt)[6:]
    return np.clip(tau, -np.asarray(model.torque_lim), np.asarray(model.torque_lim))


@pytest.mark.slow
def test_stable_pd_closed_loop(setup):
    """20 control steps (300 substeps) of PD-held standing match to <1e-8.

    Replicates the reference env loop exactly: mj_forward once at reset, then
    torque from whatever (stale) qM/qfrc_bias sit in MjData (controllers.py
    reads them at call time, after the previous mj_step)."""
    model, mj_model = setup
    mj_data = mujoco.MjData(mj_model)
    qpos = np.zeros(model.nq)
    qpos[2] = 0.94
    qpos[3:7] = [0.5, 0.5, 0.5, 0.5]
    mj_data.qpos[:] = qpos
    mujoco.mj_forward(mj_model, mj_data)

    rng = np.random.default_rng(0)
    actions = rng.uniform(-0.3, 0.3, size=(20, model.nu))
    scale = np.asarray(model.pd_action_scale)

    cstep = jax.jit(
        lambda s, a, c: engine.control_step(model, s, a, cache=c)
    )
    st = engine.PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.zeros(model.nv))
    cache = engine.pd_cache(model, st)
    for k in range(20):
        target = actions[k] * scale
        for _ in range(15):
            mj_data.ctrl[:] = reference_spd_torque(model, mj_model, mj_data, target)
            mujoco.mj_step(mj_model, mj_data)
        st, _, _, cache = cstep(st, jnp.asarray(actions[k]), cache)
    np.testing.assert_allclose(np.asarray(st.qpos), mj_data.qpos, atol=1e-8)


def test_torque_controller_matches_reference_rule(setup):
    model, _ = setup
    from smplsim_tpu.physics import control

    a = jnp.asarray(np.random.default_rng(1).uniform(-2, 2, model.nu))
    tau = control.torque_ctrl(model, a, power_scale=10.0)
    expect = np.clip(
        np.asarray(a) * 10.0 * np.asarray(model.torque_lim),
        -np.asarray(model.torque_lim),
        np.asarray(model.torque_lim),
    )
    np.testing.assert_allclose(np.asarray(tau), expect, atol=1e-12)


class _RefSimplePID:
    """Reference SimplePID verbatim (controllers.py:193-262, numpy twin)."""

    def __init__(self, Kp, Ki, Kd, dt, output_lim, scale, offset,
                 pom=False, dom=False):
        self._Kp, self._Ki, self._Kd = Kp, Ki, Kd
        self._pom, self._dom = pom, dom
        self.scale, self.offset = scale, offset
        self._lim = output_lim
        self._last_input = None
        self._last_error = None
        self._proportional = np.zeros(output_lim.shape[0])
        self._integral = np.zeros(output_lim.shape[0])
        self._dt = dt

    def control(self, action, qpos):
        feedback = qpos[7:].copy()
        setpoint = action * self.scale + self.offset
        error = setpoint - feedback
        d_input = feedback - (self._last_input if self._last_input is not None
                              else feedback)
        d_error = error - (self._last_error if self._last_error is not None
                           else error)
        if not self._pom:
            self._proportional = self._Kp * error
        else:
            self._proportional -= self._Kp * d_input
        self._integral += self._Ki * error * self._dt
        self._integral = np.clip(self._integral, -self._lim, self._lim)
        if self._dom:
            derivative = -self._Kd * d_input / self._dt
        else:
            derivative = self._Kd * d_error / self._dt
        out = np.clip(self._proportional + self._integral + derivative,
                      -self._lim, self._lim)
        self._last_input = feedback
        self._last_error = error
        return out


@pytest.mark.parametrize("pom,dom", [(False, False), (True, True)])
def test_simple_pid_parity(setup, pom, dom):
    """simple_pid_torque matches the stateful reference over 25 calls,
    including the unprimed first call and both on-measurement modes."""
    from smplsim_tpu.physics import control as ctrl_mod

    model, mj_model = setup
    nu = model.nu
    rng = np.random.RandomState(0)
    jki = np.abs(rng.randn(nu)) * 5.0
    ref = _RefSimplePID(
        np.asarray(model.jkp), jki, np.asarray(model.jkd),
        float(model.timestep), np.asarray(model.torque_lim),
        np.asarray(model.pd_action_scale), np.asarray(model.pd_action_offset),
        pom=pom, dom=dom,
    )
    st = ctrl_mod.simple_pid_init(nu, jnp.float64)
    step = jax.jit(
        lambda s, q, a: ctrl_mod.simple_pid_torque(
            model, s, q, a, jki=jnp.asarray(jki),
            proportional_on_measurement=pom,
            differential_on_measurement=dom,
        ),
        static_argnames=(),
    )
    for i in range(25):
        qpos = rng.randn(model.nq) * 0.3
        action = rng.uniform(-1, 1, nu)
        tau_ref = ref.control(action, qpos)
        tau, st = step(st, jnp.asarray(qpos), jnp.asarray(action))
        np.testing.assert_allclose(np.asarray(tau), tau_ref, atol=1e-9,
                                   err_msg=f"call {i}")
