"""SMPLX 52-body humanoid end-to-end: the reference's flagship model type.

Covers the SMPLX path (smpl_parser.py SMPLX_Parser:388-539): the 55-joint
tree is subset to the 52 SMPLH-named joints via parents_to_use (jaw/eyes
dropped), wrist-box geometry rules (smpl_local_robot.py:1347-1355), the
156-dim SMPLH-layout pose acceptance, and engine stability — mirroring
tests/test_smplh.py for the smplh family.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smplsim_tpu.body_model.smpl import SMPLParser
from smplsim_tpu.models.builder import RobotConfig, build_robot_model
from smplsim_tpu.motion.joint_names import SMPLH_MUJOCO_NAMES, SMPLH_MUJOCO_PARENTS

from tests.conftest import REFERENCE_XML  # noqa: F401 (env setup)
from tests.synthetic_body import make_synthetic_body


@pytest.fixture(scope="module")
def smplx_parser():
    return SMPLParser(
        data=make_synthetic_body(np.random.default_rng(1), "smplx"),
        model_type="smplx",
    )


@pytest.fixture(scope="module")
def smplx_model(smplx_parser):
    model, xml, height = build_robot_model(
        smplx_parser, cfg=RobotConfig(model="smplx"), dtype=jnp.float64
    )
    return model, xml


def test_smplx_parser_subsets_to_52(smplx_parser):
    p = smplx_parser
    assert len(p.parents) == 55           # full tree kept for LBS
    assert len(p.joint_names) == 52       # exposed skeleton
    assert list(p.parents_to_use) == list(range(22)) + list(range(25, 55))
    verts, jts, W, names, offsets, parents_dict, channels, jrange = (
        p.get_offsets()
    )
    assert len(names) == 52 and "Jaw" not in names and "L_Eye" not in names
    assert jts.shape == (52, 3)
    assert W.shape[1] == 52
    assert parents_dict["L_Index1"] == "L_Wrist"
    assert parents_dict["Pelvis"] is None
    # smplx widens elbows only (smpl_parser.py:397-399), not shoulders
    assert np.allclose(jrange["L_Elbow"][0, 0], -4 * np.pi)
    assert np.allclose(jrange["L_Shoulder"][0, 0], -np.pi)


def test_smplx_accepts_smplh_pose_layout(smplx_parser):
    p = smplx_parser
    pose156 = np.zeros((1, 156))
    pose156[0, 3] = 0.4           # L_Hip x
    pose156[0, 66] = 0.3          # first left-hand dof
    pose165 = np.zeros((1, 165))
    pose165[0, 3] = 0.4
    pose165[0, 75] = 0.3          # same dof shifted past jaw/eyes (9)
    v1, j1 = p.get_joints_verts(pose156)
    v2, j2 = p.get_joints_verts(pose165)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2), atol=1e-12)


def test_smplx_tree_structure(smplx_model):
    model, xml = smplx_model
    assert model.nbody == 52
    assert model.nu == 51 * 3
    assert model.humanoid_type == "smplx"
    assert list(model.body_names) == SMPLH_MUJOCO_NAMES
    assert list(model.parents) == SMPLH_MUJOCO_PARENTS


def test_smplx_mjcf_compiles_with_wrist_boxes(smplx_model):
    mujoco = pytest.importorskip("mujoco")
    _, xml = smplx_model
    mj = mujoco.MjModel.from_xml_string(xml)
    assert mj.nbody == 53
    assert mj.nu == 153
    # smplx-specific geometry: wrists become boxes (smpl_local_robot.py:1347)
    gid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_GEOM, "L_Wrist")
    assert mj.geom_type[gid] == mujoco.mjtGeom.mjGEOM_BOX
    names = [mj.actuator(i).name for i in range(mj.nu)]
    assert "L_Index1_x" in names and "R_Thumb3_z" in names


def test_smplx_engine_steps_stably(smplx_model):
    model, _ = smplx_model
    from smplsim_tpu.physics import engine

    state = engine.init_state(model)
    state = state.replace(qpos=state.qpos.at[2].set(1.0))
    cache = engine.pd_cache(model, state)
    action = jnp.zeros(model.nu, jnp.float64)

    @jax.jit
    def ctrl(state, cache):
        return engine.control_step(
            model, state, action, control_freq_inv=3, cache=cache
        )

    for _ in range(5):
        state, info, power, cache = ctrl(state, cache)
    assert np.isfinite(np.asarray(state.qpos)).all()
    assert np.isfinite(np.asarray(state.qvel)).all()


def test_smplx_env_rollout(smplx_model):
    """A speed env over the smplx humanoid: obs sizes scale with 52 bodies."""
    model, _ = smplx_model
    from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig

    model32 = jax.tree.map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") and
        a.dtype == jnp.float64 else a, model
    )
    env = HumanoidSpeed(model32, SpeedConfig(episode_length=5))
    st = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(3):
        st = step(st, jnp.zeros(env.action_size, jnp.float32))
    assert np.isfinite(np.asarray(st.obs)).all()
    assert st.obs.shape[0] == env.obs_size
