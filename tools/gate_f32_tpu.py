"""On-hardware f32 closed-loop regression gate (VERDICT r4 #4, carried r3).

Runs the PRODUCT-config f32 closed loop (SMPLSIM_QP_ITERS=16/TOL=1e-4/
ROWS=32 unless overridden) on the CURRENT backend — the real TPU when
launched plainly — and asserts it stays inside the calibration envelope:

  1. vs the f64 MuJoCo-parity golden (tests/golden/speed_ref_150.npz):
     the first step exceeding the 1e-2 BASELINE gate must be no earlier
     than t=45 (calibration r3: tight-f32 itself diverges from the f64
     golden at t=53-58 from f32 rounding alone — a solver regression shows
     up as divergence well before the rounding horizon).
  2. vs the tight-f32 trajectory (speed_ref_150_ours_f32_tight.npy):
     product-config solver error must not beat f32 rounding to the
     divergence point (first step over 1e-2 must be >= 45).
  3. getup/lying contact-rich regime: 150 product-config control steps
     from a lying init must report stalled_frac <= 0.05 — the QP iteration
     budget must actually converge where contacts pile up (ADVICE r4 weak
     #7). overflow_frac (active rows beyond the K=32 compact budget, i.e.
     row truncation) is REPORTED for the record but not gated: lying piles
     under random actions legitimately exceed 32 rows and the truncation
     is the calibrated product trade-off audited by training telemetry.

Writes CALIBRATION_r05.json and exits nonzero on gate failure.

    python tools/gate_f32_tpu.py            # on the TPU
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SMPLSIM_QP_ITERS", "16")
os.environ.setdefault("SMPLSIM_QP_TOL", "1e-4")
os.environ.setdefault("SMPLSIM_QP_ROWS", "32")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden", "speed_ref_150.npz")
TIGHT = GOLDEN.replace(".npz", "_ours_f32_tight.npy")
STEPS = 150
MIN_DIVERGENCE_STEP = 45   # calibration envelope (r3: rounding horizon 53)


def speed_gate():
    from smplsim_tpu.envs import HumanoidSpeed
    from smplsim_tpu.models import registry

    gold = np.load(GOLDEN)
    qpos_ref, acts = gold["qpos"], gold["actions"]
    tight = np.load(TIGHT)

    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model)
    st = env.reset(jax.random.PRNGKey(0))
    st = st.replace(task=st.task.replace(
        tar_speed=jnp.asarray(float(gold["tar_speed"]), jnp.float32),
        change_step=jnp.asarray(10**9, jnp.int32),
    ))
    step = jax.jit(env.step)
    qpos, stalls = [], []
    for t in range(STEPS):
        st = step(st, jnp.asarray(acts[t], jnp.float32))
        qpos.append(np.asarray(st.phys.qpos, np.float64))
        stalls.append(bool(st.info["stalled"]))
    qpos = np.asarray(qpos)

    def curve(ref):
        errs = np.abs(qpos - ref).max(axis=1)
        first = int(np.argmax(errs > 1e-2)) if (errs > 1e-2).any() else -1
        return {
            "max_err_150": float(errs.max()),
            "err_at": {str(t): float(errs[t]) for t in (9, 49, 99, 149)},
            "first_step_over_1e-2": first,
        }

    vs_golden = curve(qpos_ref)
    vs_tight = curve(tight)
    ok = all(
        c["first_step_over_1e-2"] == -1
        or c["first_step_over_1e-2"] >= MIN_DIVERGENCE_STEP
        for c in (vs_golden, vs_tight)
    )
    return {
        "task": "speed", "platform": jax.default_backend(),
        "qp_iters": int(os.environ["SMPLSIM_QP_ITERS"]),
        "qp_tol": float(os.environ["SMPLSIM_QP_TOL"]),
        "qp_rows": int(os.environ["SMPLSIM_QP_ROWS"]),
        "vs_f64_golden": vs_golden, "vs_tight_f32": vs_tight,
        "stalled_frac": float(np.mean(stalls)),
        "gate_min_divergence_step": MIN_DIVERGENCE_STEP,
        "pass": bool(ok),
    }


def getup_gate():
    """Contact-rich regime: product QP budget must converge on lying poses."""
    from smplsim_tpu.envs import HumanoidGetup
    from smplsim_tpu.models import registry

    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidGetup(model)
    B = 64
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    states = jax.jit(jax.vmap(env.reset))(keys)
    vstep = jax.jit(jax.vmap(env.step_autoreset))
    rng = np.random.RandomState(5)
    stalled, overflow, nact = [], [], []
    for t in range(STEPS):
        a = jnp.asarray(rng.uniform(-0.5, 0.5, (B, env.action_size)),
                        jnp.float32)
        states = vstep(states, a)
        stalled.append(np.asarray(states.info["stalled"]))
        overflow.append(np.asarray(states.info["overflow"]))
        nact.append(np.asarray(states.info["nactive"]))
    stalled = np.asarray(stalled)
    overflow = np.asarray(overflow)
    nact = np.asarray(nact)
    rec = {
        "task": "getup", "platform": jax.default_backend(),
        "envs": B, "steps": STEPS,
        "stalled_frac": float(stalled.mean()),
        "overflow_frac": float(overflow.mean()),
        "nactive_mean": float(nact.mean()),
        "nactive_max": int(nact.max()),
        "pass": bool(stalled.mean() <= 0.05),
    }
    return rec


def main():
    recs = [speed_gate(), getup_gate()]
    out = os.path.join(REPO, "CALIBRATION_r05.json")
    with open(out, "w") as f:
        json.dump(recs, f, indent=1)
        f.write("\n")
    for r in recs:
        print(json.dumps(r))
    print(f"wrote {out}")
    if not all(r["pass"] for r in recs):
        raise SystemExit("f32 product-config gate FAILED")
    print("f32 product-config gate PASSED")


if __name__ == "__main__":
    main()
