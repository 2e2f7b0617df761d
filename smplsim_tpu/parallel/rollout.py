"""Mesh-sharded rollout + training-step drivers.

The multi-chip analogue of the reference's process-pool sampler
(agents/agent.py:121-145): the env batch axis shards over a 1-D "data" mesh,
every device scans its shard's rollouts locally, and the PPO update reduces
gradients/metrics with pmean over ICI. Host code stays single-program
(SPMD): one jitted function, XLA lays out the collectives.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from smplsim_tpu.parallel.mesh import batch_spec, replicated_spec, shard_batch


def sharded_rollout(
    env,
    policy_fn: Callable[[jax.Array, jax.Array], jax.Array],
    mesh: Mesh,
    horizon: int,
    axis: str = "data",
):
    """Build a jitted `(env_states, key) -> (env_states', traj)` where the
    env batch is sharded over `mesh` and each device scans locally.

    policy_fn(key, obs_batch) -> action_batch is replicated (e.g. a closed
    net apply or a random policy). traj stacks (T, B_local*ndev, ...) with
    the batch axis sharded.
    """

    def local_rollout(env_states, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        vstep = jax.vmap(env.step_autoreset)

        def body(carry, k):
            st = carry
            action = policy_fn(k, st.obs)
            nxt = vstep(st, action)
            return nxt, {"obs": st.obs, "reward": nxt.reward, "done": nxt.done}

        env_states, traj = jax.lax.scan(
            body, env_states, jax.random.split(key, horizon)
        )
        return env_states, traj

    def run(env_states, key):
        st_specs = batch_spec(env_states, axis)
        out_specs = (st_specs, {"obs": P(None, axis), "reward": P(None, axis),
                                "done": P(None, axis)})
        f = shard_map(
            local_rollout, mesh=mesh, in_specs=(st_specs, P()),
            out_specs=out_specs, check_vma=False,
        )
        return jax.jit(f)(env_states, key)

    return run


def place_train_state(ts, mesh: Mesh, axis: str = "data"):
    """Place a PPO TrainState: env batch sharded, everything else replicated."""
    from smplsim_tpu.parallel.mesh import replicate

    env_states = shard_batch(ts.env_states, mesh, axis)
    rest = replicate(ts.replace(env_states=None), mesh)
    return rest.replace(env_states=env_states)


def train_state_specs(ts, axis: str = "data"):
    env_specs = batch_spec(ts.env_states, axis)
    specs = replicated_spec(ts.replace(env_states=None))
    return specs.replace(env_states=env_specs)


def sharded_ppo_step(ppo, mesh: Mesh, ts, axis: str = "data",
                     place: bool = True):
    """Jitted SPMD PPO train step over `mesh`.

    Per-device rollout rngs fold in the shard index; the carried rng stays
    REPLICATED (derived from the replicated input key) so params remain
    bit-identical across shards without relying on pmean'd gradients alone.
    Returns (step_fn, placed_ts).
    """
    specs = train_state_specs(ts, axis)

    def train_step(ts_in):
        rng_global = ts_in.rng
        idx = jax.lax.axis_index(axis)
        ts_local = ts_in.replace(rng=jax.random.fold_in(rng_global, idx))
        ts_out, metrics = ppo.train_step(ts_local, axis_name=axis)
        return ts_out.replace(rng=jax.random.fold_in(rng_global, 2**31)), metrics

    f = shard_map(
        train_step, mesh=mesh, in_specs=(specs,), out_specs=(specs, P()),
        check_vma=False,
    )
    # place=False: ts is already a global (multi-process) array tree — e.g.
    # produced by jax.jit(init, out_shardings=...); device_put of host-local
    # arrays onto a cross-process sharding is unsupported
    return jax.jit(f), (place_train_state(ts, mesh, axis) if place else ts)
