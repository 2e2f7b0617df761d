"""Throughput benchmark across batch sizes (reference examples/benchmark.py
equivalent: its 64-process AsyncVectorEnv harness becomes a vmapped batch).

    python examples/benchmark.py batches=256,1024,4096 steps=16
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from smplsim_tpu.envs import HumanoidSpeed  # noqa: E402
from smplsim_tpu.models import registry  # noqa: E402


def bench(batch: int, steps: int) -> dict:
    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    t0 = time.perf_counter()
    states = jax.jit(jax.vmap(env.reset))(keys)
    jax.block_until_ready(states.obs)
    reset_time = time.perf_counter() - t0

    vstep = jax.vmap(env.step_autoreset)

    def rollout(states, key):
        def body(st, k):
            a = jax.random.uniform(
                k, (batch, env.action_size), jnp.float32, minval=-1, maxval=1
            )
            return vstep(st, a), None

        return jax.lax.scan(body, states, jax.random.split(key, steps))[0]

    rollout = jax.jit(rollout, donate_argnums=0)
    states = rollout(states, jax.random.PRNGKey(1))
    jax.block_until_ready(states.obs)

    t0 = time.perf_counter()
    states = rollout(states, jax.random.PRNGKey(2))
    jax.block_until_ready(states.obs)
    dt = time.perf_counter() - t0
    return {
        "batch": batch,
        "reset_s": round(reset_time, 3),
        "step_ms": round(dt / steps * 1000, 2),
        "sps": round(batch * steps / dt, 1),
    }


def main():
    batches = [256, 1024]
    steps = 8
    for a in sys.argv[1:]:
        if a.startswith("batches="):
            batches = [int(x) for x in a.split("=")[1].split(",")]
        if a.startswith("steps="):
            steps = int(a.split("=")[1])
    for b in batches:
        print(json.dumps(bench(b, steps)))


if __name__ == "__main__":
    main()
