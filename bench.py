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

# Product-rate solver operating point, calibrated against the 1e-2/150-step
# product gate (tools/calibrate_solver.py -> CALIBRATION_r03.json): at
# iters=16/tol=1e-4 the loose-f32 trajectory diverges from the tight-f32
# one no sooner (step 53) than tight-f32 diverges from the f64 golden
# (step 58) — i.e. solver effort beyond this is indistinguishable from f32
# rounding on the chaotic closed-loop trajectory. K=32 compact rows covers
# the speed task's <=28 active rows; the `overflow` flag audits truncation.
# Parity tests keep the tight defaults (40/1e-6/64) via their own env.
os.environ.setdefault("SMPLSIM_QP_ITERS", "16")
os.environ.setdefault("SMPLSIM_QP_TOL", "1e-4")
os.environ.setdefault("SMPLSIM_QP_ROWS", "32")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from smplsim_tpu.envs import HumanoidSpeed
from smplsim_tpu.models import registry

BATCH = int(os.environ.get("BENCH_BATCH", 4096))
STEPS = int(os.environ.get("BENCH_STEPS", 16))  # control steps per timed scan


def _beta_batched_model():
    """BATCH-row β-heterogeneous model pytree: BENCH_BETAS distinct robots
    (AMASS-style β ~ N(0, 0.8)) stacked via stack_models and tiled to BATCH —
    the north-star 'shape-beta-randomized humanoids' config (reference
    per-env β sampling: smpl_sim/envs/nv/humanoid.py:1197-1229)."""
    import numpy as np

    from smplsim_tpu.body_model import SMPLParser
    from smplsim_tpu.models import stack_models
    from smplsim_tpu.models.builder import RobotConfig, build_robot_model

    n_betas = int(os.environ.get("BENCH_BETAS", 64))
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic_body import make_synthetic_body

    parser = SMPLParser(data=make_synthetic_body(np.random.RandomState(0), "smpl"))
    rng = np.random.RandomState(11)
    models = [
        build_robot_model(
            parser, betas=jnp.asarray(rng.randn(1, 10) * 0.8), cfg=RobotConfig()
        )[0].astype(jnp.float32)
        for _ in range(n_betas)
    ]
    batched = stack_models(models)
    reps = -(-BATCH // n_betas)
    return jax.tree.map(
        lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))[:BATCH], batched
    ), models[0]


def _smplx_model():
    """52-body SMPLX humanoid (finger gains) — the reference's flagship
    model family (skeleton_local.py:108-163 GAINS_PHC); BENCH_MODEL=smplx
    validates product-rate stability at nv=159."""
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from synthetic_body import make_synthetic_body

    from smplsim_tpu.body_model import SMPLParser
    from smplsim_tpu.models.builder import RobotConfig, build_robot_model

    parser = SMPLParser(
        data=make_synthetic_body(np.random.default_rng(1), "smplx"),
        model_type="smplx",
    )
    model, _, _ = build_robot_model(
        parser, cfg=RobotConfig(model="smplx"), dtype=jnp.float32
    )
    return model.astype(jnp.float32)


def main():
    beta_het = os.environ.get("BENCH_BETA_HET", "") not in ("", "0")
    model_kind = os.environ.get("BENCH_MODEL", "smpl")
    if beta_het:
        models, proto = _beta_batched_model()
        env = HumanoidSpeed(proto)
    elif model_kind == "smplx":
        model = _smplx_model()
        env = HumanoidSpeed(model)
    else:
        model = registry.default_humanoid(dtype=jnp.float32)
        env = HumanoidSpeed(model)

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    if beta_het:
        reset = jax.jit(jax.vmap(lambda k, m: env.reset(k, model=m)))
        states = reset(keys, models)
        vstep = jax.vmap(lambda s, a, m: env.step_autoreset(s, a, model=m))
    else:
        reset = jax.jit(jax.vmap(env.reset))
        states = reset(keys)
        vstep = jax.vmap(env.step_autoreset)

    def rollout(states, key):
        def body(st, k):
            a = jax.random.uniform(
                k, (BATCH, env.action_size), jnp.float32, minval=-1.0, maxval=1.0
            )
            st = vstep(st, a, models) if beta_het else vstep(st, a)
            return st, st.reward

        return jax.lax.scan(body, states, jax.random.split(key, STEPS))

    rollout = jax.jit(rollout, donate_argnums=0)

    import numpy as np

    # warmup / compile. Sync via a HOST READ of a scalar: on the axon TPU
    # tunnel block_until_ready returns at dispatch, not completion, and
    # micro-benchmarks that trust it report dispatch time.
    states, rew = rollout(states, jax.random.PRNGKey(1))
    float(np.asarray(rew[-1, 0]))

    n_rounds = 4
    t0 = time.perf_counter()
    for i in range(n_rounds):
        states, rew = rollout(states, jax.random.PRNGKey(2 + i))
    float(np.asarray(rew[-1, 0]))
    dt = time.perf_counter() - t0

    steps_per_sec = n_rounds * STEPS * BATCH / dt
    metric = "humanoid_env_steps_per_sec_per_chip"
    if beta_het:
        metric += "_beta_het"
    elif model_kind == "smplx":
        metric += "_smplx52"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(steps_per_sec, 1),
                "unit": f"env-steps/s ({BATCH} envs"
                        + (", per-env beta" if beta_het else "")
                        + (", smplx 52-body" if model_kind == "smplx" else "")
                        + ", 30 Hz control, 450 Hz physics)",
                "vs_baseline": round(steps_per_sec / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
