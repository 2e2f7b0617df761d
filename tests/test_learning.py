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


def test_pnn_progressive_freeze():
    """PolicyPNN (reference amp_pnn net, im_pnn.yaml): active primitive
    selection + stop_gradient on earlier columns."""
    from smplsim_tpu.learning import PolicyPNN

    net = PolicyPNN(action_dim=3, num_primitive=4, widths=(16, 16))
    obs = jnp.ones((5, 8))
    params = net.init(jax.random.PRNGKey(0), obs)
    mean_all, std_all = net.apply(params, obs)
    assert mean_all.shape == (5, 4, 3) and std_all.shape == (5, 4, 3)
    mean1, _ = net.apply(params, obs, active=1)
    assert mean1.shape == (5, 3)
    np.testing.assert_allclose(
        np.asarray(mean1), np.asarray(mean_all[:, 1]), atol=1e-6
    )

    def loss(p):
        m, _ = net.apply(p, obs, active=2)
        return jnp.sum(m ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves_with_path(g)
    for path, leaf in leaves:
        name = jax.tree_util.keystr(path)
        nrm = float(jnp.abs(leaf).sum())
        # top-level modules: MLP_i trunk + Dense_i head per column.
        # Columns 0-1 are frozen, column 2 trains, column 3 is unused by
        # active=2.
        top = name.split("]")[1].strip("['\"")  # after ['params']
        if top in ("MLP_0", "MLP_1", "MLP_3", "Dense_0", "Dense_1", "Dense_3"):
            assert nrm == 0.0, (name, nrm)
        if top in ("MLP_2", "Dense_2"):
            assert nrm > 0.0, (name, nrm)


def test_amp_discriminator_learns_and_rewards():
    """AMPDiscriminator + LSGAN loss (im.yaml:37-41,84-87) separates two
    blobs in a few Adam steps; amp_reward is higher for demo-like data."""
    import optax

    from smplsim_tpu.learning import AMPDiscriminator, amp_disc_loss, amp_reward

    rng = np.random.default_rng(0)
    demo = jnp.asarray(rng.normal(2.0, 0.4, (256, 6)), jnp.float32)
    agent = jnp.asarray(rng.normal(-2.0, 0.4, (256, 6)), jnp.float32)

    disc = AMPDiscriminator(widths=(32, 32))
    params = disc.init(jax.random.PRNGKey(1), demo)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, aux), g = jax.value_and_grad(
            lambda p: amp_disc_loss(disc.apply, p, agent, demo), has_aux=True
        )(params)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, aux

    for _ in range(60):
        params, opt_state, aux = step(params, opt_state)
    assert float(aux["disc_acc_demo"]) > 0.95
    assert float(aux["disc_acc_agent"]) > 0.95

    r_demo = amp_reward(disc.apply(params, demo)).mean()
    r_agent = amp_reward(disc.apply(params, agent)).mean()
    assert float(r_demo) > float(r_agent)
