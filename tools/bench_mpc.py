"""MPC solves/s scaling benchmark: 1 device vs N-device mesh.

BASELINE.md's third target: CEM replanning solves per second at 1 chip and
across a mesh. On real multi-chip hardware run under `jax.distributed`; on
this single-chip/dev box use XLA_FLAGS=--xla_force_host_platform_device_count=N
JAX_PLATFORMS=cpu for mesh validation numbers.

    python tools/bench_mpc.py devices=8 samples=64 horizon=4 solves=5
"""
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    n_dev = int(kv.get("devices", len(jax.devices())))
    samples = int(kv.get("samples", 64))
    horizon = int(kv.get("horizon", 4))
    n_solves = int(kv.get("solves", 5))
    out_path = kv.get("out", "")
    records = []

    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from smplsim_tpu.control import CEMConfig, CEMPlanner
    from smplsim_tpu.envs import HumanoidGetup, HumanoidSpeed
    from smplsim_tpu.models import registry

    task = kv.get("task", "getup")
    model = registry.default_humanoid(dtype=jnp.float32)
    env = (HumanoidSpeed if task == "speed" else HumanoidGetup)(model)
    st = env.reset(jax.random.PRNGKey(0))

    def timed_solves(plan_fn, label):
        # sync via HOST READ of a scalar: on the axon TPU tunnel
        # block_until_ready returns at dispatch, not completion
        a, _, _ = plan_fn(jax.random.PRNGKey(0), st)  # compile
        float(np.asarray(a).ravel()[0])
        t0 = time.perf_counter()
        for i in range(n_solves):
            a, mean, cost = plan_fn(jax.random.PRNGKey(1 + i), st)
        float(np.asarray(a).ravel()[0])
        dt = time.perf_counter() - t0
        rec = {
            "config": label, "task": task,
            "platform": jax.default_backend(),
            "solves_per_sec": round(n_solves / dt, 3),
            "ms_per_solve": round(dt / n_solves * 1000, 1),
            "samples": samples, "horizon": horizon,
        }
        print(json.dumps(rec))
        records.append(rec)
        return n_solves / dt

    # 1 device
    p1 = CEMPlanner(env, CEMConfig(horizon=horizon, num_samples=samples,
                                   num_elites=max(4, samples // 8), iterations=2))
    r1 = timed_solves(jax.jit(lambda k, s: p1.plan(k, s)), "1-device")

    # N-device mesh (same GLOBAL sample count, sharded)
    if n_dev > 1 and len(jax.devices()) >= n_dev:
        per = max(1, samples // n_dev)
        pn = CEMPlanner(env, CEMConfig(horizon=horizon, num_samples=per,
                                       num_elites=max(4, samples // 8),
                                       iterations=2))
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("samples",))

        def solve(key, s):
            key = jax.random.fold_in(key, jax.lax.axis_index("samples"))
            return pn.plan(key, s, axis_name="samples")

        sharded = jax.jit(shard_map(
            solve, mesh=mesh,
            in_specs=(P(), jax.tree.map(lambda _: P(), st)),
            out_specs=(P(), P(), P()), check_vma=False,
        ))
        rn = timed_solves(sharded, f"{n_dev}-device mesh")
        records.append({"scaling_efficiency": round(rn / r1 / 1.0, 3)})
        print(json.dumps(records[-1]))
    if out_path:
        with open(out_path, "a") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        print(f"appended {len(records)} records to {out_path}")


if __name__ == "__main__":
    main()
