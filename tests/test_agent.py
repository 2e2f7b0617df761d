"""Agent/trainer tests: config overrides, two-epoch training with
checkpoint save/load/resume, eval rollout."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from smplsim_tpu.agents import AgentHumanoid, RunConfig, parse_cli_overrides
from smplsim_tpu.learning.ppo import PPOConfig


def tiny_cfg(tmp, **kw):
    from smplsim_tpu.envs.tasks import SpeedConfig

    return RunConfig(
        task="HumanoidSpeed",
        env=SpeedConfig(control_frequency_inv=2),
        learning=PPOConfig(
            horizon=2, num_envs=4, opt_num_epochs=1, num_minibatches=1,
            policy_widths=(32, 32), value_widths=(32, 32),
        ),
        output_dir=str(tmp),
        num_epochs=2,
        save_frequency=100,
        **kw,
    )


def test_cli_overrides():
    cfg = parse_cli_overrides(
        RunConfig(),
        ["env=getup", "seed=3", "learning.gamma=0.9", "env.episode_length=10",
         "learning.policy_widths=64,64"],
    )
    assert cfg.task == "HumanoidGetup"
    assert cfg.seed == 3
    assert cfg.learning.gamma == 0.9
    assert cfg.env.episode_length == 10
    assert cfg.learning.policy_widths == (64, 64)


def test_train_checkpoint_resume(tmp_path):
    agent = AgentHumanoid(tiny_cfg(tmp_path))
    ts = agent.optimize_policy(num_epochs=2)
    assert int(ts.epoch) == 2
    assert os.path.exists(os.path.join(agent.out_dir, "log.txt"))

    # resume from the saved checkpoint in a new agent
    agent2 = AgentHumanoid(tiny_cfg(tmp_path, epoch=-1))
    ts2 = agent2.load_checkpoint(-1)
    assert int(ts2.epoch) == 2
    p0 = np.asarray(jnp.ravel(
        list(jnp.asarray(x) for x in _leaves(ts.policy_params))[0]
    ))
    p1 = np.asarray(jnp.ravel(
        list(jnp.asarray(x) for x in _leaves(ts2.policy_params))[0]
    ))
    np.testing.assert_allclose(p0, p1, atol=0)

    # continue training from the restored state
    agent2.state = ts2
    ts3 = agent2.optimize_policy(num_epochs=1)
    assert int(ts3.epoch) == 3


def test_run_policy_eval(tmp_path):
    agent = AgentHumanoid(tiny_cfg(tmp_path))
    agent.state = agent.ppo.init(jnp.asarray(np.array([0, 1], np.uint32)))
    out = agent.run_policy(n_episodes=2, horizon=3)
    assert np.isfinite(out["eval_return_mean"])


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)
