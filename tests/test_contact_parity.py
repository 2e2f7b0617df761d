"""Contact + joint-limit constraint parity vs MuJoCo.

The constraint pipeline (floor collisions, soft-constraint impedance, pyramidal
friction rows, projected-Newton dual solve) must reproduce mj_step exactly.
Self-collision parity is covered separately once body-body contacts land.
"""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

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


def default_qpos(model):
    qpos = np.zeros(model.nq)
    qpos[2] = 0.94
    qpos[3:7] = [0.5, 0.5, 0.5, 0.5]  # reference Default init
    return qpos


@pytest.mark.slow
def test_qacc_along_mujoco_trajectory(setup):
    """Forward dynamics matches mj qacc at every state of a 196-substep drop."""
    model, mj_model = setup
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = default_qpos(model)
    mujoco.mj_forward(mj_model, mj_data)
    fwd = jax.jit(lambda s: engine.forward(model, s, jnp.zeros(model.nu)).sol.qacc)
    worst = 0.0
    for t in range(196):
        st = engine.PhysicsState(
            qpos=jnp.asarray(mj_data.qpos.copy()), qvel=jnp.asarray(mj_data.qvel.copy())
        )
        qacc = np.asarray(fwd(st))
        mujoco.mj_step(mj_model, mj_data)  # computes qacc at the pre-step state
        worst = max(worst, np.abs(qacc - mj_data.qacc).max())
    assert worst < 1e-8, worst


@pytest.mark.slow
def test_closed_loop_drop_trajectory(setup):
    """Closed-loop zero-ctrl drop tracks mj_step to <1e-10 for 196 substeps
    (after which the collapsing humanoid self-collides — not yet modeled)."""
    model, mj_model = setup
    mj_data = mujoco.MjData(mj_model)
    qpos = default_qpos(model)
    mj_data.qpos[:] = qpos
    mujoco.mj_forward(mj_model, mj_data)
    step = jax.jit(lambda s: engine.step(model, s, jnp.zeros(model.nu))[0])
    st = engine.PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.zeros(model.nv))
    for _ in range(196):
        mujoco.mj_step(mj_model, mj_data)
        st = step(st)
    np.testing.assert_allclose(np.asarray(st.qpos), mj_data.qpos, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st.qvel), mj_data.qvel, atol=1e-8)


def test_contact_set_matches(setup):
    """Same contacts (geom, dist, pos) as MuJoCo at a settled standing state."""
    model, mj_model = setup
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = default_qpos(model)
    for _ in range(30):
        mujoco.mj_step(mj_model, mj_data)
    st = engine.PhysicsState(
        qpos=jnp.asarray(mj_data.qpos.copy()), qvel=jnp.asarray(mj_data.qvel.copy())
    )
    mujoco.mj_forward(mj_model, mj_data)
    info = engine.forward(model, st, jnp.zeros(model.nu))
    act = np.asarray(info.efc.con_active)
    ours = sorted(
        (
            model.geom_names[int(info.efc.con_geom[i])],
            round(float(info.efc.con_dist[i]), 9),
            tuple(np.round(np.asarray(info.efc.con_pos[i]), 6)),
        )
        for i in range(len(act))
        if act[i]
    )
    names = [mj_model.geom(i).name for i in range(mj_model.ngeom)]
    theirs = sorted(
        (
            names[mj_data.contact[i].geom2],
            round(float(mj_data.contact[i].dist), 9),
            tuple(np.round(mj_data.contact[i].pos, 6)),
        )
        for i in range(mj_data.ncon)
    )
    assert ours == theirs


def test_geom_floor_contact_flags(setup):
    """Per-geom floor-contact flags (the tasks' termination signal) match."""
    model, mj_model = setup
    mj_data = mujoco.MjData(mj_model)
    mj_data.qpos[:] = default_qpos(model)
    for _ in range(60):
        mujoco.mj_step(mj_model, mj_data)
    mujoco.mj_forward(mj_model, mj_data)
    st = engine.PhysicsState(
        qpos=jnp.asarray(mj_data.qpos.copy()), qvel=jnp.asarray(mj_data.qvel.copy())
    )
    info = engine.forward(model, st, jnp.zeros(model.nu))
    mj_flags = np.zeros(model.ngeom, dtype=bool)
    for i in range(mj_data.ncon):
        c = mj_data.contact[i]
        if c.geom1 == 0:  # floor
            mj_flags[c.geom2 - 1] = True
    np.testing.assert_array_equal(np.asarray(info.efc.geom_floor_contact), mj_flags)


def test_joint_limits():
    """Limit rows reproduce mj qacc on a toy chain with tight joint ranges
    (no self-collision possible: the only geom pair is parent-child)."""
    xml = """<mujoco><worldbody>
    <geom name=\"floor\" type=\"plane\" size=\"10 10 .2\"/>
    <body name=\"A\" pos=\"0 0 3\"><freejoint/>
    <geom type=\"capsule\" fromto=\"0 0 0 0 0 -0.3\" size=\"0.05\"/>
    <body name=\"B\" pos=\"0 0 -0.3\">
    <joint name=\"B_x\" type=\"hinge\" axis=\"1 0 0\" range=\"-20 20\" limited=\"true\" armature=\"0.01\"/>
    <joint name=\"B_y\" type=\"hinge\" axis=\"0 1 0\" range=\"-30 15\" limited=\"true\" armature=\"0.01\"/>
    <joint name=\"B_z\" type=\"hinge\" axis=\"0 0 1\" range=\"-45 45\" limited=\"true\" armature=\"0.01\"/>
    <geom type=\"capsule\" fromto=\"0 0 0 0 0 -0.25\" size=\"0.04\"/>
    </body></body></worldbody></mujoco>"""
    model = mjcf.parse_mjcf(xml, dtype=jnp.float64)
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_data = mujoco.MjData(mj_model)
    qpos = np.zeros(model.nq)
    qpos[0:3] = [0, 0, 3.0]
    qpos[3:7] = [1, 0, 0, 0]
    qpos[7] = np.deg2rad(20) + 0.03   # beyond upper
    qpos[8] = -np.deg2rad(30) - 0.05  # beyond lower
    qvel = np.zeros(model.nv)
    qvel[6] = 0.5
    qvel[7] = -0.2
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel
    mujoco.mj_forward(mj_model, mj_data)
    assert mj_data.nefc >= 2
    st = engine.PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    info = engine.forward(model, st, jnp.zeros(model.nu))
    np.testing.assert_allclose(np.asarray(info.sol.qacc), mj_data.qacc, atol=1e-8)
