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
