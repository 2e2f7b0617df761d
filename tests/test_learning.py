"""Learning-stack tests: GAE vs a literal port of the reference recursion,
running-norm statistics, PPO train step smoke (single device + 8-device
shard_map mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smplsim_tpu.learning import estimate_advantages, norm_init, norm_update, normalize
from smplsim_tpu.learning.ppo import PPO, PPOConfig


def reference_gae(rewards, values, last_value, not_done, not_dead, gamma, tau):
    """Sequential recursion exactly as learning_utils.py:200-220."""
    T, B = rewards.shape
    adv = np.zeros((T, B))
    prev_adv = np.zeros(B)
    prev_value = last_value.copy()
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * prev_value * not_dead[t] - values[t]
        adv[t] = delta + gamma * tau * prev_adv * not_done[t]
        prev_adv = adv[t]
        prev_value = values[t]
    return adv, adv + values


def test_gae_matches_reference_recursion():
    rng = np.random.RandomState(0)
    T, B = 40, 7
    rewards = rng.randn(T, B)
    values = rng.randn(T, B)
    last_value = rng.randn(B)
    done = rng.rand(T, B) < 0.1
    dead = done & (rng.rand(T, B) < 0.5)
    not_done = 1.0 - done.astype(np.float64)
    not_dead = 1.0 - dead.astype(np.float64)

    ref_adv, ref_ret = reference_gae(
        rewards, values, last_value, not_done, not_dead, 0.99, 0.95
    )
    adv, ret = estimate_advantages(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(last_value),
        jnp.asarray(not_done), jnp.asarray(not_dead), 0.99, 0.95,
    )
    np.testing.assert_allclose(np.asarray(adv), ref_adv, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ret), ref_ret, atol=1e-10)


def test_running_norm_matches_batch_stats():
    rng = np.random.RandomState(1)
    stats = norm_init(5, jnp.float64)
    chunks = [rng.randn(64, 5) * 3.0 + 1.5 for _ in range(6)]
    for c in chunks:
        stats = norm_update(stats, jnp.asarray(c))
    full = np.concatenate(chunks)
    np.testing.assert_allclose(np.asarray(stats.mean), full.mean(0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(stats.var), full.var(0), atol=1e-8)
    z = normalize(stats, jnp.asarray(full))
    np.testing.assert_allclose(np.asarray(z).mean(0), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_env():
    from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig
    from smplsim_tpu.models import registry

    model = registry.default_humanoid(dtype=jnp.float32)
    return HumanoidSpeed(model, SpeedConfig(control_frequency_inv=3))


def test_ppo_train_step_single_device(tiny_env):
    cfg = PPOConfig(
        horizon=2, num_envs=4, opt_num_epochs=1, num_minibatches=1,
        policy_widths=(32, 32), value_widths=(32, 32),
    )
    ppo = PPO(tiny_env, cfg)
    ts = ppo.init(jax.random.PRNGKey(0))
    step = jax.jit(lambda s: ppo.train_step(s))
    ts2, metrics = step(ts)
    jax.block_until_ready(ts2)
    assert int(ts2.epoch) == 1
    assert np.isfinite(float(metrics["reward_mean"]))
    # params actually changed
    p0 = jax.tree_util.tree_leaves(ts.policy_params)[0]
    p1 = jax.tree_util.tree_leaves(ts2.policy_params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_dryrun_multichip_8():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    ge.dryrun_multichip(8)
