"""Body-body collision: narrowphase geometry vs MuJoCo.

Exact for capsule-capsule; capsule-box matches MuJoCo's deepest contact
(MuJoCo's manifold can add a second, shallower point — a known fidelity gap
documented in collision_pairs.py)."""
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from smplsim_tpu.models import mjcf
from smplsim_tpu.physics import kinematics
from smplsim_tpu.physics.collision_pairs import self_contacts
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


def test_deepest_self_contacts_match(setup):
    """At the first self-contact of a falling humanoid, our deepest contact
    per pair matches MuJoCo's (dist, pos, normal)."""
    model, mj_model = setup
    mj_data = mujoco.MjData(mj_model)
    qpos = np.zeros(model.nq)
    qpos[2] = 0.94
    qpos[3:7] = [0.5, 0.5, 0.5, 0.5]
    mj_data.qpos[:] = qpos
    mujoco.mj_forward(mj_model, mj_data)
    for _ in range(250):
        mujoco.mj_step(mj_model, mj_data)
        if any(mj_data.contact[i].geom1 != 0 for i in range(mj_data.ncon)):
            break
    mujoco.mj_forward(mj_model, mj_data)

    kin = kinematics.fk(model, jnp.asarray(mj_data.qpos.copy()))
    sc = self_contacts(model, kin)
    ours = {}
    for i in range(len(np.asarray(sc.active))):
        if sc.active[i]:
            key = (int(sc.body1[i]), int(sc.body2[i]))
            d = float(sc.dist[i])
            if key not in ours or d < ours[key][0]:
                ours[key] = (d, np.asarray(sc.pos[i]), np.asarray(sc.normal[i]))

    theirs = {}
    for i in range(mj_data.ncon):
        c = mj_data.contact[i]
        if c.geom1 == 0:
            continue
        key = (c.geom1 - 1, c.geom2 - 1)  # geom idx == body idx in this model
        if key not in theirs or c.dist < theirs[key][0]:
            theirs[key] = (c.dist, c.pos.copy(), c.frame[:3].copy())

    assert theirs, "expected self-contacts in the collapsed pose"
    assert set(ours) == set(theirs)
    for key in theirs:
        d_mj, p_mj, n_mj = theirs[key]
        d_us, p_us, n_us = ours[key]
        assert abs(d_mj - d_us) < 1e-6, (key, d_mj, d_us)
        np.testing.assert_allclose(p_us, p_mj, atol=1e-5)
        np.testing.assert_allclose(n_us, n_mj, atol=1e-4)


def test_capsule_capsule_exact():
    """Cross and parallel capsule pairs vs MuJoCo (toy 2-body scene)."""
    def scene(quat2, pos2):
        # A - C (far-away spacer) - B: grandparent pairs DO collide under
        # MuJoCo's filterparent rule, direct parent-child do not
        joints = lambda n: "".join(
            f'<joint name="{n}_{ax}" type="hinge" axis="{v}"/>'
            for ax, v in (("x", "1 0 0"), ("y", "0 1 0"), ("z", "0 0 1"))
        )
        return f"""<mujoco><worldbody>
        <body name=\"A\" pos=\"0 0 1\"><freejoint/>
        <geom type=\"capsule\" fromto=\"-0.2 0 0 0.2 0 0\" size=\"0.05\"/>
        <body name=\"C\" pos=\"3 0 0\">{joints("C")}
        <geom type=\"sphere\" size=\"0.01\"/>
        <body name=\"B\" pos=\"{pos2[0]-3} {pos2[1]} {pos2[2]}\" quat=\"{quat2[0]} {quat2[1]} {quat2[2]} {quat2[3]}\">{joints("B")}
        <geom type=\"capsule\" fromto=\"-0.2 0 0 0.2 0 0\" size=\"0.05\"/>
        </body></body></body></worldbody></mujoco>"""

    # crossing (rotate child 90deg about z), touching
    for quat2, pos2, expect_n in (
        ((0.7071068, 0, 0, 0.7071068), (0.0, 0.0, 0.09), 1),   # crossing
        ((1, 0, 0, 0), (0.05, 0.0, 0.09), 2),                  # parallel
    ):
        xml = scene(quat2, pos2)
        mj_model = mujoco.MjModel.from_xml_string(xml)
        mj_data = mujoco.MjData(mj_model)
        mujoco.mj_forward(mj_model, mj_data)
        model = mjcf.parse_mjcf(xml, dtype=jnp.float64)
        kin = kinematics.fk(model, jnp.asarray(mj_data.qpos.copy()))
        sc = self_contacts(model, kin)
        act = np.asarray(sc.active)
        assert mj_data.ncon == expect_n
        assert act.sum() == expect_n
        mj_pts = sorted(tuple(np.round(mj_data.contact[i].pos, 6)) for i in range(mj_data.ncon))
        our_pts = sorted(
            tuple(np.round(np.asarray(sc.pos[i]), 6)) for i in range(len(act)) if act[i]
        )
        assert mj_pts == our_pts
        for i in range(len(act)):
            if act[i]:
                assert abs(float(sc.dist[i]) - mj_data.contact[0].dist) < 1e-9
