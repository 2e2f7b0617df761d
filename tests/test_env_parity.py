"""Env-level parity: our functional envs vs the reference's gymnasium envs
running real MuJoCo (via tests/ref_shim.py). Validates observation
composition, task rewards, termination, and full closed-loop trajectories.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import ref_shim  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from smplsim_tpu.envs import (  # noqa: E402
    GetupConfig,
    HumanoidGetup,
    HumanoidReach,
    HumanoidSpeed,
    ReachConfig,
    SpeedConfig,
)
from smplsim_tpu.models import registry  # noqa: E402
from smplsim_tpu.physics.engine import PhysicsState  # noqa: E402


@pytest.fixture(scope="module")
def model64():
    return registry.default_humanoid(dtype=jnp.float64)


@pytest.fixture(scope="module")
def ref():
    ref_shim.import_reference()
    import smpl_sim  # noqa: F401
    return ref_shim


def make_ref_env(ref, task, **env_overrides):
    cfg = ref.default_cfg(task=task, **env_overrides)
    from smpl_sim.envs.tasks.humanoid_getup import HumanoidGetup as RefGetup
    from smpl_sim.envs.tasks.humanoid_reach import HumanoidReach as RefReach
    from smpl_sim.envs.tasks.humanoid_speed import HumanoidSpeed as RefSpeed

    cls = {"HumanoidSpeed": RefSpeed, "HumanoidGetup": RefGetup,
           "HumanoidReach": RefReach}[task]
    env = cls(cfg)
    ref.CURRENT_DATA[0] = env.mj_data
    return env


def pin_speed(ref_env, ours_state, tar_speed):
    ref_env._tar_speed = tar_speed
    ref_env._speed_change_steps = 10**9
    task = ours_state.task.replace(
        tar_speed=jnp.asarray(tar_speed, jnp.float64),
        change_step=jnp.asarray(10**9, jnp.int32),
    )
    return ours_state.replace(task=task)


def test_sizes_match(model64, ref):
    env_ref = make_ref_env(ref, "HumanoidSpeed")
    ours = HumanoidSpeed(model64)
    assert ours.action_size == env_ref.get_action_size()
    assert ours.obs_size == env_ref.get_obs_size()
    assert ours.self_obs_size == env_ref.get_self_obs_size()


def test_obs_formula_parity(model64, ref):
    """Same arbitrary (qpos,qvel) -> same observation vector, both tasks."""
    env_ref = make_ref_env(ref, "HumanoidSpeed")
    ours = HumanoidSpeed(model64)
    rng = np.random.RandomState(3)

    for _ in range(3):
        qpos = np.zeros(model64.nq)
        qpos[0:3] = rng.uniform(-1, 1, 3)
        qpos[2] += 1.5
        q = rng.normal(size=4)
        qpos[3:7] = q / np.linalg.norm(q)
        qpos[7:] = rng.uniform(-0.5, 0.5, model64.nq - 7)
        qvel = rng.uniform(-1, 1, model64.nv)

        env_ref.mj_data.qpos[:] = qpos
        env_ref.mj_data.qvel[:] = qvel
        import mujoco

        mujoco.mj_forward(env_ref.mj_model, env_ref.mj_data)
        env_ref._tar_speed = 2.5
        obs_ref = np.concatenate(
            [env_ref.compute_proprioception(), env_ref.compute_task_obs()]
        )

        st = ours.reset(jax.random.PRNGKey(0))
        st = pin_speed(env_ref, st, 2.5)
        phys = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
        from smplsim_tpu.physics import kinematics

        kin = kinematics.fk(model64, phys.qpos)
        obs_ours = np.asarray(ours.compute_obs(st.task, phys, kin))
        np.testing.assert_allclose(obs_ours, obs_ref, atol=1e-8)


@pytest.mark.slow
def test_obs_v2_sensor_parity(model64, ref):
    """self_obs_v=2 on the MuJoCo path: the reference reads body velocities
    from framelinvel/frameangvel sensordata (humanoid_env.py:539-544,
    637-688); ours derives them analytically (kinematics.body_velocities).
    Same arbitrary (qpos, qvel) -> same v2 observation vector."""
    cfg = ref.default_cfg(task="HumanoidSpeed", self_obs_v=2)
    cfg.robot.create_vel_sensors = True
    from smpl_sim.envs.tasks.humanoid_speed import HumanoidSpeed as RefSpeed

    env_ref = RefSpeed(cfg)
    ref.CURRENT_DATA[0] = env_ref.mj_data
    ours = HumanoidSpeed(model64, SpeedConfig(self_obs_v=2))
    assert ours.self_obs_size == env_ref.get_self_obs_size()

    import mujoco
    rng = np.random.RandomState(9)
    for _ in range(3):
        qpos = np.zeros(model64.nq)
        qpos[0:3] = rng.uniform(-1, 1, 3)
        qpos[2] += 1.5
        q = rng.normal(size=4)
        qpos[3:7] = q / np.linalg.norm(q)
        qpos[7:] = rng.uniform(-0.5, 0.5, model64.nq - 7)
        qvel = rng.uniform(-1, 1, model64.nv)

        env_ref.mj_data.qpos[:] = qpos
        env_ref.mj_data.qvel[:] = qvel
        mujoco.mj_forward(env_ref.mj_model, env_ref.mj_data)
        obs_ref = env_ref.compute_proprioception()

        phys = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
        from smplsim_tpu.physics import kinematics

        kin = kinematics.fk(model64, phys.qpos)
        st = ours.reset(jax.random.PRNGKey(0))
        obs_ours = np.asarray(ours.compute_obs(st.task, phys, kin))
        prop_ours = obs_ours[: ours.self_obs_size]
        np.testing.assert_allclose(prop_ours, obs_ref, atol=1e-8)


def test_reach_obs_and_reward_formula(model64, ref):
    env_ref = make_ref_env(ref, "HumanoidReach")
    ours = HumanoidReach(model64)
    rng = np.random.RandomState(5)

    qpos = np.zeros(model64.nq)
    qpos[2] = 0.94
    qpos[3:7] = [0.5, 0.5, 0.5, 0.5]
    qpos[7:] = rng.uniform(-0.3, 0.3, model64.nq - 7)
    env_ref.mj_data.qpos[:] = qpos
    env_ref.mj_data.qvel[:] = 0
    import mujoco

    mujoco.mj_forward(env_ref.mj_model, env_ref.mj_data)
    tar = np.array([0.4, -0.2, 1.3])
    env_ref._tar_pos = tar[None]
    obs_ref = env_ref.compute_task_obs()
    rew_ref = env_ref.compute_reward(None)

    phys = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.zeros(model64.nv))
    from smplsim_tpu.physics import kinematics

    kin = kinematics.fk(model64, phys.qpos)
    st = ours.reset(jax.random.PRNGKey(0))
    task = st.task.replace(tar_pos=jnp.asarray(tar))
    np.testing.assert_allclose(
        np.asarray(ours.task_obs(task, phys, kin)), obs_ref, atol=1e-8
    )
    np.testing.assert_allclose(
        float(ours.reward(task, phys, kin, None)), rew_ref, atol=1e-8
    )


@pytest.mark.slow
def test_speed_closed_loop_trajectory(model64, ref):
    """150 closed-loop control steps with identical actions: qpos within
    1e-2, reward within 5e-3 (the BASELINE.md parity gate)."""
    env_ref = make_ref_env(ref, "HumanoidSpeed")
    env_ref.reset(seed=0)
    ours = HumanoidSpeed(model64)
    st = ours.reset(jax.random.PRNGKey(0))
    st = pin_speed(env_ref, st, 2.0)

    step = jax.jit(ours.step)
    rng = np.random.RandomState(7)
    for t in range(150):
        a = rng.uniform(-0.3, 0.3, ours.action_size)
        obs_ref, rew_ref, term_ref, trunc_ref, _ = env_ref.step(a)
        st = step(st, jnp.asarray(a))
        qpos_ref = env_ref.get_qpos()
        err = np.abs(np.asarray(st.phys.qpos) - qpos_ref).max()
        assert err < 1e-2, f"qpos diverged at t={t}: {err}"
        assert abs(float(st.reward) - rew_ref) < 5e-3, f"reward t={t}"
        assert bool(st.terminated) == term_ref, f"terminated t={t}"
        if term_ref:
            break


@pytest.mark.slow
def test_termination_parity_lying_pose(model64, ref):
    """A body lying on the floor must terminate in both (non-foot contact)."""
    env_ref = make_ref_env(ref, "HumanoidSpeed")
    env_ref.reset(seed=0)
    # lie flat: root at 0.2 m, identity orientation (SMPL zero pose is supine)
    env_ref.mj_data.qpos[:] = 0
    env_ref.mj_data.qvel[:] = 0
    env_ref.mj_data.qpos[2] = 0.2
    env_ref.mj_data.qpos[3:7] = [1, 0, 0, 0]
    import mujoco

    mujoco.mj_forward(env_ref.mj_model, env_ref.mj_data)

    ours = HumanoidSpeed(model64)
    st = ours.reset(jax.random.PRNGKey(0))
    st = pin_speed(env_ref, st, 2.0)
    qpos = np.zeros(model64.nq)
    qpos[2] = 0.2
    qpos[3] = 1.0
    st = st.replace(
        phys=PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.zeros(model64.nv)),
        kin=None,  # injected phys: force step() to re-derive FK
    )

    # falling from 0.2 m: the trunk reaches the floor within ~30 control
    # steps; termination must fire on the same step in both
    a = np.zeros(ours.action_size)
    step = jax.jit(ours.step)
    term_step_ref, term_step_ours = None, None
    for t in range(30):
        if term_step_ref is None:
            _, _, term_ref, _, _ = env_ref.step(a)
            if term_ref:
                term_step_ref = t
        if term_step_ours is None:
            st = step(st, jnp.asarray(a))
            if bool(st.terminated):
                term_step_ours = t
        if term_step_ref is not None and term_step_ours is not None:
            break
    assert term_step_ref is not None, "reference never terminated"
    assert term_step_ours == term_step_ref


def test_getup_recovery_grace(model64):
    """No termination for recovery_steps after reset even while lying down."""
    ours = HumanoidGetup(model64, GetupConfig(recovery_steps=5))
    st = ours.reset(jax.random.PRNGKey(0))
    step = jax.jit(ours.step)
    a = jnp.zeros(ours.action_size)
    for t in range(5):
        st = step(st, a)
        assert not bool(st.terminated), f"terminated during grace at t={t}"


def test_vmap_autoreset(model64):
    """Batch of envs steps under jit+vmap; done envs restart at cur_t=0."""
    model32 = registry.default_humanoid(dtype=jnp.float32)
    ours = HumanoidSpeed(model32, SpeedConfig(episode_length=3))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states = jax.vmap(ours.reset)(keys)
    step = jax.jit(jax.vmap(ours.step_autoreset))
    for t in range(5):
        a = jnp.zeros((4, ours.action_size), jnp.float32)
        states = step(states, a)
    # after 5 steps with episode_length=3 every env must have reset once
    assert np.all(np.asarray(states.cur_t) <= 3)
    assert states.obs.shape == (4, ours.obs_size)
