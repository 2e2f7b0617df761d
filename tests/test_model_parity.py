"""RobotModel build parity vs the MuJoCo compiler on the SMPL humanoid MJCF."""
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

from smplsim_tpu.models import mjcf
from tests.conftest import REFERENCE_XML


@pytest.fixture(scope="module")
def pair():
    with open(REFERENCE_XML) as f:
        xml = f.read()
    model = mjcf.parse_mjcf(xml, dtype=jnp.float64)
    mj = mujoco.MjModel.from_xml_string(xml)
    return model, mj


def test_tree_structure(pair):
    model, mj = pair
    assert model.nbody == mj.nbody - 1  # mujoco counts world
    assert model.nq == mj.nq
    assert model.nv == mj.nv
    assert model.nu == mj.nu
    for b in range(model.nbody):
        assert model.body_names[b] == mj.body(b + 1).name
        assert model.parents[b] == mj.body_parentid[b + 1] - 1
    np.testing.assert_allclose(np.asarray(model.body_pos), mj.body_pos[1:], atol=1e-12)


def test_mass_com_inertia(pair):
    model, mj = pair
    np.testing.assert_allclose(
        np.asarray(model.body_mass), mj.body_mass[1:], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(model.body_ipos), mj.body_ipos[1:], atol=1e-9
    )
    # mujoco stores principal inertia + iquat; reconstruct full tensor
    for b in range(model.nbody):
        R = sRot.from_quat(mj.body_iquat[b + 1], scalar_first=True).as_matrix()
        full = R @ np.diag(mj.body_inertia[b + 1]) @ R.T
        np.testing.assert_allclose(
            np.asarray(model.body_inertia[b]), full, atol=1e-8,
            err_msg=f"body {model.body_names[b]}",
        )


def test_dofs_and_armature(pair):
    model, mj = pair
    np.testing.assert_allclose(np.asarray(model.armature), mj.dof_armature, atol=1e-12)
    np.testing.assert_allclose(np.asarray(model.dof_damping), mj.dof_damping, atol=1e-12)
    # joint ranges (skip free joint = first)
    np.testing.assert_allclose(
        np.asarray(model.jnt_range), mj.jnt_range[1:], atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(model.gear), mj.actuator_gear[:, 0], atol=1e-12)


def test_geoms(pair):
    model, mj = pair
    # mujoco geom 0 is the floor plane
    assert model.ngeom == mj.ngeom - 1
    for g in range(model.ngeom):
        mg = g + 1
        assert model.geom_body[g] == mj.geom_bodyid[mg] - 1
        np.testing.assert_allclose(
            np.asarray(model.geom_pos[g]), mj.geom_pos[mg], atol=1e-9
        )
        ours_R = sRot.from_quat(np.array(model.geom_quat[g]), scalar_first=True).as_matrix()
        theirs_R = sRot.from_quat(mj.geom_quat[mg], scalar_first=True).as_matrix()
        # capsule frames are only defined up to rotation about / sign of the axis
        assert abs(abs(float(ours_R[:, 2] @ theirs_R[:, 2])) - 1.0) < 1e-9
        np.testing.assert_allclose(
            np.asarray(model.geom_margin[g]), mj.geom_margin[mg], atol=1e-12
        )


def test_pd_action_scale_matches_reference_rule(pair):
    model, _ = pair
    # all baked ranges are +-pi -> scale = min(1.2*pi, pi) = pi
    np.testing.assert_allclose(np.asarray(model.pd_action_scale), np.pi, atol=1e-9)
    np.testing.assert_allclose(np.asarray(model.pd_action_offset), 0.0, atol=1e-12)
