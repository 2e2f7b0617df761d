"""Device-mesh plumbing: distributed init, mesh construction, shardings.

The reference's only concurrency is a fork/queue process pool
(smpl_sim/agents/agent.py:121-145) and a horovod flag it never exercises
(nv/data/cfg/train/rlg/im_mcp.yaml:52). The TPU-native equivalents:

  * `init_distributed()`      — jax.distributed.initialize for multi-host
                                pods (coordinator from env or args).
  * `data_mesh(n)`            — 1-D "data" mesh over the first n local (or
                                all global) devices; env batches shard over
                                it, params replicate.
  * `shard_batch/replicate`   — NamedSharding placement helpers.
  * `shard_env_states`        — place an EnvState batch on the mesh with
                                everything per-env sharded.

Gradient/metric reductions ride `jax.lax.pmean` inside shard_map (see
learning/ppo.py train_step(axis_name=...)); cost reductions for MPC use
all_gather/psum (control/cem.py). ICI vs DCN layout: keep the env/data axis
innermost (ICI) — these collectives are tiny (grads + scalars), the rollout
compute dominates.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX. No-op when single-process (the common
    single-chip / single-host case, and under tests)."""
    num = num_processes if num_processes is not None else int(
        os.environ.get("SMPLSIM_NUM_PROCESSES", "1")
    )
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("SMPLSIM_COORDINATOR", "localhost:12355"),
        num_processes=num,
        process_id=process_id if process_id is not None else int(
            os.environ.get("SMPLSIM_PROCESS_ID", "0")
        ),
    )


def data_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over devices; n_devices=None uses all of them."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf's leading axis over the mesh axis."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_env_states(states: Any, mesh: Mesh, axis: str = "data") -> Any:
    """EnvState batches are fully per-env: shard everything."""
    return shard_batch(states, mesh, axis)


def batch_spec(tree: Any, axis: str = "data") -> Any:
    """PartitionSpec pytree: leading axis sharded for every leaf."""
    return jax.tree.map(lambda _: P(axis), tree)


def replicated_spec(tree: Any) -> Any:
    return jax.tree.map(lambda _: P(), tree)
