"""SMPLH 52-body humanoid: articulated-hand model family end-to-end.

Covers the reference's smplh path (smpl_parser.py SMPLH_Parser:250, finger
gains GAINS_PHC skeleton_local.py:108-163, SMPLH_MUJOCO_NAMES ordering,
freeze-mask action gating) through our builder -> engine -> env stack.
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
def smplh_model():
    parser = SMPLParser(
        data=make_synthetic_body(np.random.default_rng(0), "smplh"),
        model_type="smplh",
    )
    model, xml, height = build_robot_model(
        parser, cfg=RobotConfig(model="smplh"), dtype=jnp.float64
    )
    return model, xml, parser


def test_smplh_tree_structure(smplh_model):
    model, xml, _ = smplh_model
    assert model.nbody == 52
    assert model.nu == 51 * 3
    assert model.humanoid_type == "smplh"
    assert list(model.body_names) == SMPLH_MUJOCO_NAMES
    assert list(model.parents) == SMPLH_MUJOCO_PARENTS


def test_smplh_mjcf_compiles_in_mujoco(smplh_model):
    mujoco = pytest.importorskip("mujoco")
    _, xml, _ = smplh_model
    mj = mujoco.MjModel.from_xml_string(xml)
    assert mj.nbody == 53  # world + 52
    assert mj.nu == 153
    # finger actuators exist with gear 1 (GAINS finger rows)
    names = [mj.actuator(i).name for i in range(mj.nu)]
    assert "L_Index1_x" in names and "R_Thumb3_z" in names


def test_smplh_engine_steps_stably(smplh_model):
    model, _, _ = smplh_model
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


def test_smplh_fk_batch(smplh_model):
    model, _, _ = smplh_model
    from smplsim_tpu.motion.fk import HumanoidBatchFK

    fk = HumanoidBatchFK.from_robot_model(model, filter_vel=False)
    assert fk.num_joints == 52
    pose = jnp.zeros((1, 3, 52, 3))
    trans = jnp.zeros((1, 3, 3))
    out = fk.fk_batch(pose, trans, return_full=True)
    assert out["global_translation"].shape == (1, 3, 52, 3)
    assert out["qpos"].shape == (1, 3, model.nq)
    assert np.isfinite(np.asarray(out["qvel"])).all()


def test_smplh_nv_env_with_finger_freeze(smplh_model):
    model, _, _ = smplh_model
    from smplsim_tpu.envs import NvConfig, NvHumanoid

    env = NvHumanoid(model, NvConfig(control_frequency_inv=2))
    assert env.obs_size == 1 + 51 * 3 + 52 * 12
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    assert np.isfinite(np.asarray(state.obs)).all()


def test_smplh_gains_cover_all_joints(smplh_model):
    model, _, _ = smplh_model
    # every actuated joint has positive stable-PD gains and torque limits
    assert np.asarray(model.jkp).shape == (153,)
    assert (np.asarray(model.jkp) > 0).all()
    assert (np.asarray(model.torque_lim) > 0).all()
    # finger gains are the PHC table (100, 10) — last 3 dofs are R_Thumb3
    names = list(model.body_names)
    d = (names.index("R_Thumb3") - 1) * 3
    np.testing.assert_allclose(np.asarray(model.jkp)[d:d + 3], 100.0)
    np.testing.assert_allclose(np.asarray(model.jkd)[d:d + 3], 10.0)
