"""Mesh/sharding plumbing on the 8-virtual-device CPU mesh (conftest)."""
import numpy as np

import jax
import jax.numpy as jnp

from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig
from smplsim_tpu.learning.ppo import PPO, PPOConfig
from smplsim_tpu.models import registry
from smplsim_tpu.parallel import (
    data_mesh,
    init_distributed,
    shard_batch,
    sharded_ppo_step,
    sharded_rollout,
)


def test_init_distributed_single_process_noop():
    init_distributed(num_processes=1)  # must not raise / must not connect


def test_data_mesh_and_shard_batch():
    mesh = data_mesh(8)
    assert mesh.devices.shape == (8,)
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch({"a": x}, mesh)
    assert len(xs["a"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(xs["a"]), np.asarray(x))


def test_sharded_rollout():
    mesh = data_mesh(4)
    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model, SpeedConfig(control_frequency_inv=2))
    B = 8
    states = jax.vmap(env.reset)(jax.random.split(jax.random.PRNGKey(0), B))
    states = shard_batch(states, mesh)

    def policy(k, obs):
        return jax.random.uniform(
            k, (obs.shape[0], env.action_size), obs.dtype, -1.0, 1.0
        )

    run = sharded_rollout(env, policy, mesh, horizon=2)
    states2, traj = run(states, jax.random.PRNGKey(1))
    assert traj["reward"].shape == (2, B)
    assert np.isfinite(np.asarray(traj["reward"])).all()
    assert np.isfinite(np.asarray(states2.obs)).all()
    # different shards saw different action streams -> different rewards
    r = np.asarray(traj["reward"])
    assert np.abs(r[:, 0] - r[:, -1]).max() > 0


def test_sharded_ppo_step():
    mesh = data_mesh(4)
    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model, SpeedConfig(control_frequency_inv=2))
    ppo = PPO(env, PPOConfig(
        horizon=2, num_envs=8, opt_num_epochs=1, num_minibatches=1,
        policy_widths=(32,), value_widths=(32,),
    ))
    ts = ppo.init(jax.random.PRNGKey(0))
    step, ts = sharded_ppo_step(ppo, mesh, ts)
    ts2, metrics = step(ts)
    jax.block_until_ready(ts2)
    assert int(ts2.epoch) == 1
    assert np.isfinite(float(metrics["reward_mean"]))
    # params stayed replicated (same value on every device)
    leaf = jax.tree.leaves(ts2.policy_params)[0]
    assert np.isfinite(np.asarray(leaf)).all()
    ts3, _ = step(ts2)
    assert int(ts3.epoch) == 2
