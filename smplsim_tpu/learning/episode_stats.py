"""Per-episode statistics over vectorized rollouts (LoggerRL equivalent).

The reference accumulates per-worker episode stats and merges them
(smpl_sim/learning/logger_rl.py:8-56: num_episodes, total/avg reward,
episode-length stats). Here the tracker is a pytree carried through the
jitted rollout: per-env running return/length plus completed-episode
aggregates, merged across envs (and across shards with psum if an axis_name
is given).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


class EpisodeStats(struct.PyTreeNode):
    # per-env accumulators
    cur_return: jax.Array    # (B,)
    cur_length: jax.Array    # (B,)
    # completed-episode aggregates
    num_episodes: jax.Array  # ()
    total_return: jax.Array  # ()
    total_length: jax.Array  # ()
    max_return: jax.Array    # ()
    min_return: jax.Array    # ()


def stats_init(num_envs: int, dtype=jnp.float32) -> EpisodeStats:
    z = jnp.zeros((num_envs,), dtype)
    return EpisodeStats(
        cur_return=z, cur_length=z,
        num_episodes=jnp.zeros((), dtype),
        total_return=jnp.zeros((), dtype),
        total_length=jnp.zeros((), dtype),
        max_return=jnp.full((), -jnp.inf, dtype),
        min_return=jnp.full((), jnp.inf, dtype),
    )


def stats_step(s: EpisodeStats, reward: jax.Array, done: jax.Array) -> EpisodeStats:
    """Fold one vectorized env step (reward (B,), done (B,) bool)."""
    ret = s.cur_return + reward
    length = s.cur_length + 1.0
    d = done.astype(ret.dtype)
    finished_ret = ret * d
    return EpisodeStats(
        cur_return=ret * (1.0 - d),
        cur_length=length * (1.0 - d),
        num_episodes=s.num_episodes + d.sum(),
        total_return=s.total_return + finished_ret.sum(),
        total_length=s.total_length + (length * d).sum(),
        max_return=jnp.maximum(s.max_return, jnp.where(done, ret, -jnp.inf).max()),
        min_return=jnp.minimum(s.min_return, jnp.where(done, ret, jnp.inf).min()),
    )


def stats_summary(s: EpisodeStats, axis_name: str | None = None) -> dict:
    """LoggerRL-style summary; psum-merged across shards when axis_name set
    (the reference's classmethod merge, logger_rl.py:43-56)."""
    n = s.num_episodes
    tr, tl = s.total_return, s.total_length
    mx, mn = s.max_return, s.min_return
    if axis_name is not None:
        n = jax.lax.psum(n, axis_name)
        tr = jax.lax.psum(tr, axis_name)
        tl = jax.lax.psum(tl, axis_name)
        mx = jax.lax.pmax(mx, axis_name)
        mn = jax.lax.pmin(mn, axis_name)
    safe = jnp.maximum(n, 1.0)
    return {
        "num_episodes": n,
        "avg_episode_reward": tr / safe,
        "avg_episode_len": tl / safe,
        "max_episode_reward": mx,
        "min_episode_reward": mn,
    }
