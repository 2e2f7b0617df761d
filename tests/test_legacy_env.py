"""Legacy dm-style env tests: tolerance shaping vs the reference formulas,
locomotion reward parity with the reference's numpy composition, subtree CoM
velocity vs MuJoCo subtree_linvel, playback stepping."""
import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplsim_tpu.envs.legacy import HumanoidMove, HumanoidPlayback, MoveConfig
from smplsim_tpu.models import registry
from smplsim_tpu.utils.tolerance import tolerance
from tests.conftest import REFERENCE_XML


def dm_tolerance_np(x, bounds=(0.0, 0.0), margin=0.0, sigmoid="gaussian",
                    value_at_margin=0.1):
    """Reference numpy implementation (utils/tolerance.py:25-135)."""
    lower, upper = bounds
    in_bounds = np.logical_and(lower <= x, x <= upper)
    if margin == 0:
        return np.where(in_bounds, 1.0, 0.0)
    d = np.where(x < lower, lower - x, x - upper) / margin
    if sigmoid == "gaussian":
        scale = np.sqrt(-2 * np.log(value_at_margin))
        v = np.exp(-0.5 * (d * scale) ** 2)
    elif sigmoid == "linear":
        sx = d * (1 - value_at_margin)
        v = np.where(abs(sx) < 1, 1 - sx, 0.0)
    elif sigmoid == "quadratic":
        sx = d * np.sqrt(1 - value_at_margin)
        v = np.where(abs(sx) < 1, 1 - sx**2, 0.0)
    else:
        raise ValueError(sigmoid)
    return np.where(in_bounds, 1.0, v)


def test_tolerance_matches_dm_control():
    rng = np.random.RandomState(0)
    x = rng.randn(100) * 2
    for kwargs in [
        dict(bounds=(0.5, np.inf), margin=0.25),
        dict(bounds=(0.9, np.inf), sigmoid="linear", margin=1.9, value_at_margin=0),
        dict(margin=1, value_at_margin=0, sigmoid="quadratic"),
        dict(margin=2),
        dict(bounds=(0.0, 0.0), margin=0.0),
    ]:
        ours = np.asarray(tolerance(jnp.asarray(x), **kwargs))
        ref = dm_tolerance_np(x, **kwargs)
        np.testing.assert_allclose(ours, ref, atol=1e-7, err_msg=str(kwargs))


@pytest.fixture(scope="module")
def env64():
    model = registry.default_humanoid(dtype=jnp.float64)
    return HumanoidMove(model, MoveConfig(move_speed=1.0, sim_timestep_inv=450,
                                          control_frequency_inv=15))


def test_subtree_com_velocity_matches_mujoco(env64):
    model = env64.model
    mj_model = mujoco.MjModel.from_xml_path(REFERENCE_XML)
    mj_data = mujoco.MjData(mj_model)
    rng = np.random.RandomState(1)
    qpos = np.zeros(model.nq)
    qpos[2] = 1.0
    q = rng.randn(4); qpos[3:7] = q / np.linalg.norm(q)
    qpos[7:] = rng.uniform(-0.4, 0.4, model.nq - 7)
    qvel = rng.uniform(-1, 1, model.nv)
    mj_data.qpos[:] = qpos
    mj_data.qvel[:] = qvel
    mujoco.mj_forward(mj_model, mj_data)
    mujoco.mj_subtreeVel(mj_model, mj_data)
    chest_id = mj_model.body("Chest").id

    from smplsim_tpu.physics import kinematics
    kin = kinematics.fk(model, jnp.asarray(qpos))
    V = kinematics.body_twists(model, kin, jnp.asarray(qvel))
    com_lin = V[:, 3:] + jnp.cross(V[:, :3], kin.com)
    com_vel = jnp.einsum("j,jd->d", env64._chest_subtree_w, com_lin)
    np.testing.assert_allclose(
        np.asarray(com_vel), mj_data.subtree_linvel[chest_id], atol=1e-8
    )


@pytest.mark.full  # compile-heavy: full tier
def test_move_reward_composition(env64):
    """Reward equals the reference composition evaluated on the same pieces."""
    st = env64.reset(jax.random.PRNGKey(0))
    a = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, env64.action_size))
    st2 = env64.step(st, a)
    r = float(st2.reward)
    assert 0.0 <= r <= 1.0

    # recompute in numpy from the post-step state
    from smplsim_tpu.physics import kinematics
    kin = kinematics.fk(env64.model, st2.phys.qpos)
    cfg = env64.config
    head_h = float(kin.xpos[env64._head, 2])
    stand_h = cfg.full_height * cfg.stand_height_frac
    standing = dm_tolerance_np(head_h, (stand_h, np.inf), stand_h / 4)
    upright = dm_tolerance_np(
        float(kin.xmat[env64._chest][2, 1]), (0.9, np.inf), 1.9, "linear", 0
    )
    small = dm_tolerance_np(np.asarray(jnp.clip(a, -1, 1)), (0, 0), 1,
                            "quadratic", 0).mean()
    small = (4 + small) / 5
    V = kinematics.body_twists(env64.model, kin, st2.phys.qvel)
    com_lin = V[:, 3:] + jnp.cross(V[:, :3], kin.com)
    com_speed = float(jnp.linalg.norm(
        jnp.einsum("j,jd->d", env64._chest_subtree_w, com_lin)[:2]
    ))
    move = dm_tolerance_np(com_speed, (1.0, np.inf), 1.0, "linear", 0)
    expect = small * standing * upright * (5 * move + 1) / 6
    np.testing.assert_allclose(r, expect, atol=1e-6)


@pytest.mark.full  # compile-heavy: full tier
def test_playback_steps_through_motion():
    from smplsim_tpu.motion import HumanoidBatchFK, MotionLib, MotionLibConfig

    model = registry.default_humanoid(dtype=jnp.float64)
    fk = HumanoidBatchFK.from_robot_model(model, filter_vel=False)
    rng = np.random.RandomState(3)
    T = 8
    pose = rng.randn(T, fk.num_joints, 3).cumsum(0) * 0.01
    trans = np.tile([0, 0, 1.0], (T, 1))
    lib = MotionLib(fk, MotionLibConfig(randomize_heading=False),
                    motion_dict={"m": {"pose_aa": pose, "trans": trans, "fps": 30.0}})
    lib.load_motions(np.array([0]))
    env = HumanoidPlayback(model, lib)
    st = env.reset(jax.random.PRNGKey(0))
    for t in range(T + 2):
        st = env.step(st, jnp.zeros(env.action_size))
    np.testing.assert_allclose(
        np.asarray(st.phys.qpos), np.asarray(lib.qpos[T - 1]), atol=1e-12
    )
    assert bool(st.truncated)
