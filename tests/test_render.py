"""Offline rollout rendering: geom-level GIF output (smplsim_tpu/render.py).

Covers the reference's eval video dump (smpl_sim/envs/base_env.py:148-201)
in its GL-free form: a qpos trajectory renders to an animated GIF with one
frame per (subsampled) step.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from smplsim_tpu.models import registry
from smplsim_tpu.render import render_rollout


def test_render_rollout_writes_gif(tmp_path):
    model = registry.default_humanoid(dtype=jnp.float32)
    qpos = np.zeros((6, model.nq), np.float32)
    qpos[:, 2] = 0.94
    qpos[:, 3:7] = [0.5, 0.5, 0.5, 0.5]
    qpos[:, 0] = np.linspace(0.0, 0.3, 6)
    path = str(tmp_path / "roll.gif")
    n = render_rollout(model, qpos, path, every=2)
    assert n == 3
    assert os.path.getsize(path) > 1000
    with open(path, "rb") as f:
        assert f.read(6) in (b"GIF87a", b"GIF89a")


@pytest.mark.full  # compile-heavy: full tier
def test_run_policy_render_path(tmp_path):
    """run_policy(render_path=...) produces the GIF artifact end-to-end."""
    from smplsim_tpu.agents import AgentHumanoid, RunConfig
    from smplsim_tpu.learning.ppo import PPOConfig

    cfg = RunConfig(
        exp_name="render_test",
        output_dir=str(tmp_path),
        learning=PPOConfig(num_envs=2, horizon=2, num_minibatches=1,
                           opt_num_epochs=1,
                           policy_widths=(32,), value_widths=(32,)),
    )
    agent = AgentHumanoid(cfg)
    agent.state = agent.ppo.init(__import__("jax").random.PRNGKey(0))
    gif = str(tmp_path / "eval.gif")
    agent.run_policy(n_episodes=1, horizon=3, render_path=gif)
    assert os.path.getsize(gif) > 1000


def test_render_rollout_writes_mp4(tmp_path):
    """.mp4 extension routes through the OpenCV encoder (reference parity:
    base_env.py:148-201 writes mp4 via imageio/ffmpeg)."""
    import jax
    import jax.numpy as jnp

    from smplsim_tpu import render
    from smplsim_tpu.models import registry

    model = registry.default_humanoid(dtype=jnp.float32)
    qpos = jnp.tile(model.qpos0[None], (4, 1))
    qpos = qpos.at[:, 2].add(jnp.linspace(0.9, 1.0, 4))
    path = str(tmp_path / "roll.mp4")
    n = render.render_rollout(model, qpos, path, every=1)
    assert n == 4
    assert os.path.getsize(path) > 1000
