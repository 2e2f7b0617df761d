"""Body-model layer tests: JAX LBS vs a literal numpy reference, and the
full beta->RobotModel builder pipeline on a synthetic SMPL-like body
(real SMPL data is licensed and absent — exactly the situation where the
reference falls back to its baked MJCF; the synthetic model exercises every
stage of the pipeline instead)."""
import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as sRot

from smplsim_tpu.body_model import SMPLParser, lbs
from smplsim_tpu.models import registry
from smplsim_tpu.models.builder import RobotConfig, build_robot_model
from smplsim_tpu.motion.joint_names import SMPL_BONE_ORDER_NAMES


# ---------------------------------------------------------------------------
def numpy_lbs(betas, pose_aa, v_template, shapedirs, posedirs, J_reg, parents, W):
    """Straightforward numpy LBS (the SMPL paper's algorithm, unbatched)."""
    v_shaped = v_template + (shapedirs @ betas).reshape(-1, 3)
    J = J_reg @ v_shaped
    n_j = len(parents)
    R = sRot.from_rotvec(pose_aa.reshape(n_j, 3)).as_matrix()
    if posedirs is not None:
        feat = (R[1:] - np.eye(3)).reshape(-1)
        v_posed = v_shaped + (feat @ posedirs).reshape(-1, 3)
    else:
        v_posed = v_shaped
    G = np.zeros((n_j, 4, 4))
    for j in range(n_j):
        T = np.eye(4)
        T[:3, :3] = R[j]
        T[:3, 3] = J[j] - (J[parents[j]] if parents[j] >= 0 else 0)
        G[j] = T if parents[j] < 0 else G[parents[j]] @ T
    joints = G[:, :3, 3].copy()
    for j in range(n_j):
        corr = G[j, :3, :3] @ J[j]
        G[j, :3, 3] -= corr
    verts = np.zeros_like(v_posed)
    for v in range(v_posed.shape[0]):
        T = sum(W[v, j] * G[j] for j in range(n_j))
        verts[v] = (T @ np.append(v_posed[v], 1.0))[:3]
    return verts, joints


from tests.synthetic_body import make_synthetic_body


def make_synthetic_smpl(rng, n_extra=40):
    """Shared generator (tests/synthetic_body.py), SMPL 24-joint variant."""
    return make_synthetic_body(rng, "smpl", n_extra=n_extra)


@pytest.fixture(scope="module")
def synthetic():
    return make_synthetic_smpl(np.random.RandomState(0))


def test_lbs_matches_numpy_reference(synthetic):
    d = synthetic
    rng = np.random.RandomState(1)
    betas = rng.randn(10) * 0.5
    pose = rng.randn(24 * 3) * 0.2
    pd = d["posedirs"].reshape(-1, 23 * 9).T  # (207, V*3)
    ref_v, ref_j = numpy_lbs(
        betas, pose, d["v_template"],
        d["shapedirs"].reshape(-1, 10), pd,
        d["J_regressor"],
        [-1 if i == 0 else int(d["kintree_table"][0, i]) for i in range(24)],
        d["weights"],
    )
    parser = SMPLParser(data=d)
    verts, joints = parser.get_joints_verts(
        jnp.asarray(pose)[None], betas=jnp.asarray(betas)[None]
    )
    np.testing.assert_allclose(np.asarray(joints[0]), ref_j, atol=1e-9)
    np.testing.assert_allclose(np.asarray(verts[0]), ref_v, atol=1e-9)


def test_builder_pipeline_compiles_and_matches_mujoco(synthetic):
    """beta -> MJCF -> MuJoCo compile == our RobotModel (mass/inertia/tree)."""
    parser = SMPLParser(data=synthetic)
    betas = jnp.asarray(np.random.RandomState(2).randn(1, 10) * 0.3)
    model, xml, height = build_robot_model(parser, betas=betas,
                                           cfg=RobotConfig(), dtype=jnp.float64)
    mj = mujoco.MjModel.from_xml_string(xml)
    assert model.nbody == mj.nbody - 1
    assert model.nu == mj.nu == 69
    np.testing.assert_allclose(
        np.asarray(model.body_mass), mj.body_mass[1:], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(model.body_pos), mj.body_pos[1:], atol=1e-12
    )
    for b in range(model.nbody):
        R = sRot.from_quat(mj.body_iquat[b + 1], scalar_first=True).as_matrix()
        full = R @ np.diag(mj.body_inertia[b + 1]) @ R.T
        np.testing.assert_allclose(
            np.asarray(model.body_inertia[b]), full, atol=1e-8,
            err_msg=f"body {model.body_names[b]}",
        )
    assert height > 0


def test_builder_beta_changes_geometry(synthetic):
    parser = SMPLParser(data=synthetic)
    m0, _, h0 = build_robot_model(parser, betas=jnp.zeros((1, 10)))
    m1, _, h1 = build_robot_model(parser, betas=jnp.full((1, 10), 2.0))
    assert not np.allclose(np.asarray(m0.body_pos), np.asarray(m1.body_pos))


@pytest.mark.full  # compile-heavy: full tier
def test_built_model_steps_stably(synthetic):
    """The built robot runs through the physics engine without NaN."""
    from smplsim_tpu.physics import engine

    parser = SMPLParser(data=synthetic)
    model, _, _ = build_robot_model(parser, betas=jnp.zeros((1, 10)))
    st = engine.init_state(model)
    st = engine.PhysicsState(qpos=st.qpos.at[2].set(1.0), qvel=st.qvel)
    step = jax.jit(
        lambda s: engine.control_step(model, s, jnp.zeros(model.nu, jnp.float32))[0]
    )
    for _ in range(5):
        st = step(st)
    assert np.isfinite(np.asarray(st.qpos)).all()
