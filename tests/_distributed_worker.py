"""Worker process for tests/test_distributed.py: one of N jax.distributed
processes, each with 4 virtual CPU devices, running the sharded PPO step
over the GLOBAL 8-device mesh.

Usage: python _distributed_worker.py <coordinator> <num_procs> <proc_id>
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")


def barrier(name: str, timeout_ms: int = 600_000):
    """Coordination-service barrier (no collectives, no Gloo): all processes
    block here until everyone arrives. Used to keep compile-time skew out of
    the Gloo context-init window — its KV-store exchange has a hard 30 s
    deadline, and a worker that finishes compiling minutes before its peer
    would hit it (observed deterministically on slow CPU compiles)."""
    from jax._src import distributed

    distributed.global_state.client.wait_at_barrier(name, timeout_ms)


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
        initialization_timeout=300,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh

    assert jax.process_count() == num_procs, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 4 * num_procs, len(devices)
    assert len(jax.local_devices()) == 4

    from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig
    from smplsim_tpu.learning.ppo import PPO, PPOConfig
    from smplsim_tpu.models import registry
    from smplsim_tpu.parallel import rollout as par_rollout

    mesh = Mesh(devices, ("data",))
    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model, SpeedConfig(control_frequency_inv=2))
    cfg = PPOConfig(
        horizon=2,
        num_envs=2 * len(devices),
        opt_num_epochs=1,
        num_minibatches=1,
        policy_widths=(32, 32),
        value_widths=(32, 32),
    )
    ppo = PPO(env, cfg)
    print(f"pid {pid}: building init", flush=True)
    # init DIRECTLY into the global sharding via jit out_shardings — a
    # host-side device_put of locally-committed arrays onto a cross-process
    # NamedSharding is not supported (it hangs waiting for the other hosts)
    from jax.sharding import NamedSharding

    template = jax.eval_shape(ppo.init, jax.random.PRNGKey(0))
    spec_tree = par_rollout.train_state_specs(template)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), spec_tree,
        is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
    )
    # Establish the 8-device Gloo clique while the processes are still in
    # lock-step (right after a barrier): the context init's KV exchange has a
    # 30 s deadline that compile skew must not eat.
    from jax.sharding import NamedSharding as NS, PartitionSpec as P

    barrier("pre-warmup")
    warm = jax.jit(
        lambda x: jax.shard_map(
            lambda v: jax.lax.psum(v, "data"), mesh=mesh,
            in_specs=P("data"), out_specs=P(),
        )(x),
    )(jax.device_put(
        jnp.ones(len(devices)), NS(mesh, P("data"))
    ))
    assert float(jax.device_get(warm)[0]) == len(devices)
    print(f"pid {pid}: gloo warm-up ok", flush=True)

    ts = jax.jit(ppo.init, out_shardings=shardings)(jax.random.PRNGKey(0))
    print(f"pid {pid}: init placed", flush=True)
    step, ts = par_rollout.sharded_ppo_step(ppo, mesh, ts, place=False)
    # AOT-compile the step on every process BEFORE anyone dispatches it, then
    # barrier: the first execution's collectives start near-simultaneously.
    step_c = step.lower(ts).compile()
    print(f"pid {pid}: step compiled", flush=True)
    barrier("post-compile")
    for _ in range(2):
        ts, metrics = step_c(ts)
    import numpy as np

    reward = float(np.asarray(jax.device_get(metrics["reward_mean"])))
    assert np.isfinite(reward)
    # params must stay bit-identical across processes: check a digest
    leaf = np.asarray(
        jax.device_get(jax.tree.leaves(ts.policy_params)[0])
    )
    digest = float(np.abs(leaf).sum())
    print(f"WORKER_OK pid={pid} reward={reward:.6f} digest={digest:.9e}",
          flush=True)


if __name__ == "__main__":
    main()
