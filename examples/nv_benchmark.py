"""Isaac-path throughput harness: NvHumanoid through the gym vector facade.

Equivalent of the reference examples/nv_benchmark.py:159-186 (2048 Isaac Gym
envs, random actions, reports reset/step time + steps/s) — here the batch is
one jitted vmap on device behind the gymnasium-vector API.

Usage: python examples/nv_benchmark.py [envs=2048] [steps=16] [obs_v=1]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax.numpy as jnp

from smplsim_tpu.envs import GymVectEnv, NvConfig, NvHumanoid
from smplsim_tpu.models import registry


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    num_envs = int(kv.get("envs", 2048))
    steps = int(kv.get("steps", 16))
    obs_v = int(kv.get("obs_v", 1))

    model = registry.default_humanoid(dtype=jnp.float32)
    env = NvHumanoid(model, NvConfig(obs_v=obs_v))
    venv = GymVectEnv(env, num_envs=num_envs)

    t0 = time.perf_counter()
    obs, _ = venv.reset(seed=0)
    t_reset = time.perf_counter() - t0
    print(f"reset: {t_reset:.2f}s (includes compile)  obs {obs.shape}")

    rng = np.random.default_rng(0)
    act = rng.uniform(-1, 1, (num_envs, env.action_size)).astype(np.float32)
    # warm up the step compile
    venv.step(act)

    t0 = time.perf_counter()
    for _ in range(steps):
        obs, rew, term, trunc, info = venv.step(act)
    dt = time.perf_counter() - t0
    sps = steps * num_envs / dt
    print(f"step avg: {dt / steps * 1e3:.1f} ms   throughput: {sps:,.0f} env-steps/s")
    print(f"reward mean {rew.mean():.3f}  terminated {term.mean():.3f}")


if __name__ == "__main__":
    main()
