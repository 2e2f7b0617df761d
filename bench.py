"""Throughput benchmark: vmapped humanoid speed-task rollouts on one chip.

TPU-native analogue of the reference harness (examples/benchmark.py:97-133,
which measures `step/sps` over 64 AsyncVectorEnv processes): here the batch
is a single jitted vmap over device arrays, stepping B envs in lockstep with
random actions (stable-PD control, 450 Hz physics / 30 Hz control — the
same operating point as data/cfg/env/speed.yaml).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e6 (the BASELINE.md target of 1e6 env-steps/s/chip).
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from smplsim_tpu.envs import HumanoidSpeed
from smplsim_tpu.models import registry

BATCH = int(os.environ.get("BENCH_BATCH", 4096))
STEPS = int(os.environ.get("BENCH_STEPS", 16))  # control steps per timed scan


def main():
    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model)

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    reset = jax.jit(jax.vmap(env.reset))
    states = reset(keys)

    vstep = jax.vmap(env.step_autoreset)

    def rollout(states, key):
        def body(st, k):
            a = jax.random.uniform(
                k, (BATCH, env.action_size), jnp.float32, minval=-1.0, maxval=1.0
            )
            st = vstep(st, a)
            return st, st.reward

        return jax.lax.scan(body, states, jax.random.split(key, STEPS))

    rollout = jax.jit(rollout, donate_argnums=0)

    # warmup / compile
    states, _ = rollout(states, jax.random.PRNGKey(1))
    jax.block_until_ready(states)

    n_rounds = 4
    t0 = time.perf_counter()
    for i in range(n_rounds):
        states, rew = rollout(states, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0

    steps_per_sec = n_rounds * STEPS * BATCH / dt
    print(
        json.dumps(
            {
                "metric": "humanoid_env_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": f"env-steps/s ({BATCH} envs, 30 Hz control, 450 Hz physics)",
                "vs_baseline": round(steps_per_sec / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
