"""Cross-entropy-method MPC over the vmapped physics engine.

The reference has no planner (its control is RL-only); this is the
TPU-native MPC deliverable from BASELINE.md's north star: N candidate action
sequences roll out in lockstep under jit/vmap (each rollout = lax.scan over
control steps of the same 450 Hz stable-PD physics the envs use), elites are
selected and the sampling distribution refit for a fixed number of CEM
iterations. Multi-chip: shard the sample axis over a mesh and pass
axis_name — elite selection uses an all_gather of per-sample costs (N
scalars, negligible on ICI) and the refit statistics psum across shards.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from smplsim_tpu.envs.base import EnvState, HumanoidEnv


@dataclasses.dataclass(frozen=True)
class CEMConfig:
    horizon: int = 8            # control steps per rollout (each = 15 substeps)
    num_samples: int = 128      # candidate action sequences (global)
    num_elites: int = 16
    iterations: int = 3
    init_std: float = 0.5
    min_std: float = 0.05
    alpha: float = 0.1          # distribution smoothing (old <- new mix)


class CEMPlanner:
    """Plans in the env's action space, cost = -sum(reward)."""

    def __init__(self, env: HumanoidEnv, config: CEMConfig | None = None):
        self.env = env
        self.cfg = config or CEMConfig()

    def _rollout_cost(self, state: EnvState, actions: jax.Array) -> jax.Array:
        """actions (H, nu) -> scalar cost. Terminated rollouts stop accruing
        reward (termination is absorbing for planning purposes)."""

        def body(carry, a):
            st, alive = carry
            nxt = self.env.step(st, a)
            rew = nxt.reward * alive
            alive = alive * (1.0 - nxt.terminated.astype(rew.dtype))
            return (nxt, alive), rew

        (_, _), rews = jax.lax.scan(
            body, (state, jnp.ones((), actions.dtype)), actions
        )
        return -jnp.sum(rews)

    def plan(
        self,
        key: jax.Array,
        state: EnvState,
        mean: jax.Array | None = None,
        axis_name: str | None = None,
    ):
        """One MPC solve. Returns (first action (nu,), full mean (H, nu)).

        mean: warm-start action-sequence mean (receding horizon: pass the
        previous plan shifted by one step). Under shard_map, num_samples is
        the PER-SHARD count and axis_name enables global elite selection.
        """
        cfg = self.cfg
        nu = self.env.action_size
        dtype = state.phys.qpos.dtype
        if mean is None:
            mean = jnp.zeros((cfg.horizon, nu), dtype)
        std = jnp.full((cfg.horizon, nu), cfg.init_std, dtype)

        cost_fn = jax.vmap(self._rollout_cost, in_axes=(None, 0))

        def iteration(carry, k):
            mean, std = carry
            eps = jax.random.normal(k, (cfg.num_samples, cfg.horizon, nu), dtype)
            actions = jnp.clip(mean + std * eps, -1.0, 1.0)
            costs = cost_fn(state, actions)  # (N,)

            if axis_name is None:
                all_costs = costs
                all_actions = actions
            else:
                # gather costs + actions across shards for global elites
                all_costs = jax.lax.all_gather(costs, axis_name).reshape(-1)
                all_actions = jax.lax.all_gather(actions, axis_name).reshape(
                    -1, cfg.horizon, nu
                )
            elite_idx = jnp.argsort(all_costs)[: cfg.num_elites]
            elites = all_actions[elite_idx]  # (E, H, nu)
            new_mean = jnp.mean(elites, axis=0)
            new_std = jnp.std(elites, axis=0)
            mean = cfg.alpha * mean + (1 - cfg.alpha) * new_mean
            std = jnp.maximum(
                cfg.alpha * std + (1 - cfg.alpha) * new_std, cfg.min_std
            )
            best = all_costs[elite_idx[0]]
            return (mean, std), best

        (mean, std), best_costs = jax.lax.scan(
            iteration, (mean, std), jax.random.split(key, cfg.iterations)
        )
        return mean[0], mean, best_costs[-1]

    def receding_horizon(
        self, key: jax.Array, state: EnvState, n_steps: int,
        axis_name: str | None = None,
    ):
        """Closed-loop MPC: plan, apply first action, shift, repeat.

        Returns (final EnvState, rewards (n_steps,), costs (n_steps,)).
        """
        cfg = self.cfg
        nu = self.env.action_size
        dtype = state.phys.qpos.dtype
        mean0 = jnp.zeros((cfg.horizon, nu), dtype)

        def body(carry, k):
            st, mean = carry
            a, mean, cost = self.plan(k, st, mean, axis_name)
            nxt = self.env.step(st, a)
            # shift the plan forward one step (receding horizon warm start)
            mean = jnp.concatenate([mean[1:], jnp.zeros((1, nu), dtype)])
            return (nxt, mean), (nxt.reward, cost)

        (state, _), (rews, costs) = jax.lax.scan(
            body, (state, mean0), jax.random.split(key, n_steps)
        )
        return state, rews, costs
