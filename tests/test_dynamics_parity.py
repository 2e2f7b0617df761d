"""Smooth (contact-free) dynamics parity vs MuJoCo on the SMPL humanoid.

MuJoCo 3.x is the golden oracle: identical qpos/qvel/ctrl in, compare FK,
sensors, mass matrix, bias forces, smooth accelerations, and free-flight
trajectories (the BASELINE parity gate, contact rows come in a later layer).
"""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from smplsim_tpu.models import mjcf
from smplsim_tpu.physics import dynamics, integrator, kinematics
from tests.conftest import REFERENCE_XML


@pytest.fixture(scope="module")
def setup():
    with open(REFERENCE_XML) as f:
        xml = f.read()
    model = mjcf.parse_mjcf(xml, dtype=jnp.float64)
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_model.opt.timestep = 1.0 / 450.0
    mj_data = mujoco.MjData(mj_model)
    return model, mj_model, mj_data


def random_state(model, seed=0, vel_scale=1.0):
    rng = np.random.default_rng(seed)
    qpos = np.zeros(model.nq)
    qpos[0:3] = rng.normal(size=3) * np.array([1, 1, 0.2]) + np.array([0, 0, 1.5])
    q = rng.normal(size=4)
    qpos[3:7] = q / np.linalg.norm(q)
    qpos[7:] = rng.uniform(-0.6, 0.6, size=model.nq - 7)
    qvel = rng.normal(size=model.nv) * vel_scale
    return qpos, qvel


def set_mj(mj_model, mj_data, qpos, qvel, ctrl=None):
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel
    if ctrl is not None:
        mj_data.ctrl[:] = ctrl
    mujoco.mj_forward(mj_model, mj_data)


def test_fk_matches_mujoco(setup):
    model, mj_model, mj_data = setup
    for seed in range(3):
        qpos, qvel = random_state(model, seed)
        set_mj(mj_model, mj_data, qpos, qvel)
        kin = kinematics.fk(model, jnp.asarray(qpos))
        np.testing.assert_allclose(np.asarray(kin.xpos), mj_data.xpos[1:], atol=1e-10)
        quats = np.asarray(kinematics.body_quats(model, jnp.asarray(qpos)))
        mjq = mj_data.xquat[1:]
        sign = np.sign(np.sum(quats * mjq, axis=-1, keepdims=True))
        np.testing.assert_allclose(quats, sign * mjq, atol=1e-10)
        # COM positions
        np.testing.assert_allclose(np.asarray(kin.com), mj_data.xipos[1:], atol=1e-10)


def test_body_velocity_sensors(setup):
    model, mj_model, mj_data = setup
    qpos, qvel = random_state(model, 7)
    set_mj(mj_model, mj_data, qpos, qvel)
    mujoco.mj_sensorPos(mj_model, mj_data)
    mujoco.mj_sensorVel(mj_model, mj_data)
    nb = model.nbody
    sens = mj_data.sensordata
    lin_mj = sens[: nb * 3].reshape(nb, 3)
    ang_mj = sens[nb * 3 : nb * 6].reshape(nb, 3)
    kin = kinematics.fk(model, jnp.asarray(qpos))
    lin, ang = kinematics.body_velocities(model, kin, jnp.asarray(qvel))
    np.testing.assert_allclose(np.asarray(lin), lin_mj, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ang), ang_mj, atol=1e-9)


def test_mass_matrix(setup):
    model, mj_model, mj_data = setup
    for seed in range(3):
        qpos, qvel = random_state(model, seed + 10)
        set_mj(mj_model, mj_data, qpos, qvel)
        M_mj = np.zeros((mj_model.nv, mj_model.nv))
        mujoco.mj_fullM(mj_model, mj_data, M_mj)
        kin = kinematics.fk(model, jnp.asarray(qpos))
        M = np.asarray(dynamics.mass_matrix(model, kin))
        np.testing.assert_allclose(M, M_mj, atol=1e-9)


def test_bias_forces(setup):
    model, mj_model, mj_data = setup
    for seed in range(3):
        qpos, qvel = random_state(model, seed + 20)
        set_mj(mj_model, mj_data, qpos, qvel)
        kin = kinematics.fk(model, jnp.asarray(qpos))
        C = np.asarray(dynamics.bias_forces(model, kin, jnp.asarray(qvel)))
        np.testing.assert_allclose(C, mj_data.qfrc_bias, atol=1e-8)


def test_smooth_qacc(setup):
    model, mj_model, mj_data = setup
    rng = np.random.default_rng(3)
    qpos, qvel = random_state(model, 30)
    ctrl = rng.uniform(-50, 50, size=model.nu)
    mj_model.opt.disableflags = mj_model.opt.disableflags | int(mujoco.mjtDisableBit.mjDSBL_CONTACT)
    try:
        set_mj(mj_model, mj_data, qpos, qvel, ctrl)
        kin = kinematics.fk(model, jnp.asarray(qpos))
        sm = dynamics.smooth_dynamics(model, kin, jnp.asarray(qvel), jnp.asarray(ctrl))
        np.testing.assert_allclose(np.asarray(sm.qacc_smooth), mj_data.qacc, atol=1e-8)
    finally:
        mj_model.opt.disableflags = mj_model.opt.disableflags & ~int(mujoco.mjtDisableBit.mjDSBL_CONTACT)


@pytest.mark.slow
def test_free_flight_trajectory(setup):
    """150 substeps of contact-free dynamics track MuJoCo to <1e-6 rad."""
    model, mj_model, mj_data = setup
    qpos, qvel = random_state(model, 40, vel_scale=0.5)
    qpos[2] = 50.0  # high above the floor
    ctrl = np.random.default_rng(4).uniform(-2, 2, size=model.nu)
    # disable contacts + joint limits: both are constraint-solver features
    # with their own parity tests; this test isolates smooth dynamics
    saved = mj_model.opt.disableflags
    mj_model.opt.disableflags = saved | int(
        mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_LIMIT
    )
    set_mj(mj_model, mj_data, qpos, qvel, ctrl)

    dt = mj_model.opt.timestep

    @jax.jit
    def step(qp, qv):
        kin = kinematics.fk(model, qp)
        sm = dynamics.smooth_dynamics(model, kin, qv, jnp.asarray(ctrl))
        return integrator.euler_step(model, qp, qv, sm.qacc_smooth, dt)

    qp, qv = jnp.asarray(qpos), jnp.asarray(qvel)
    for t in range(150):
        mujoco.mj_step(mj_model, mj_data)
        qp, qv = step(qp, qv)

    mj_model.opt.disableflags = saved
    np.testing.assert_allclose(np.asarray(qp)[7:], mj_data.qpos[7:], atol=1e-6)
    np.testing.assert_allclose(np.asarray(qp)[:3], mj_data.qpos[:3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(qv), mj_data.qvel, atol=1e-5)


def test_external_forces_match_xfrc_applied(setup):
    """dynamics.external_forces == MuJoCo xfrc_applied (COM wrench) route."""
    model64, mj_model, mj_data = setup
    rng = np.random.RandomState(21)
    qpos, qvel = random_state(model64, seed=21)
    force = rng.uniform(-50, 50, (model64.nbody, 3))
    torque = rng.uniform(-10, 10, (model64.nbody, 3))

    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel
    mj_data.xfrc_applied[:] = 0
    mj_data.xfrc_applied[1:, :3] = force   # mj body 0 is world
    mj_data.xfrc_applied[1:, 3:] = torque
    mujoco.mj_forward(mj_model, mj_data)
    # compare accelerations with and without the wrench to isolate its
    # generalized-force contribution
    qacc_with = mj_data.qacc.copy()
    mj_data.xfrc_applied[:] = 0
    mujoco.mj_forward(mj_model, mj_data)
    qacc_without = mj_data.qacc.copy()

    from smplsim_tpu.physics import dynamics as dyn
    from smplsim_tpu.physics import kinematics, linalg

    kin = kinematics.fk(model64, jnp.asarray(qpos))
    M = dyn.mass_matrix(model64, kin)
    qfrc_ext = dyn.external_forces(
        model64, kin, jnp.asarray(force), jnp.asarray(torque)
    )
    dqacc = np.asarray(linalg.cho_solve(linalg.cholesky(M), qfrc_ext))
    np.testing.assert_allclose(dqacc, qacc_with - qacc_without, atol=1e-7)
