"""Calibrate contact-QP effort against the product gate (VERDICT r2 weak #3).

The parity suite demands 1e-8 qacc row parity (f64, tight KKT); the PRODUCT
gate (BASELINE.md) is 1e-2 joint angle over 150 closed-loop control steps.
This tool measures the iterations/KKT-tol -> 150-step trajectory-divergence
curve so bench.py can run the loosest setting that passes the gate.

Modes:
  python tools/calibrate_solver.py golden
      Roll the reference MuJoCo speed env 150 steps (the exact action
      sequence of tests/test_env_parity.py::test_speed_closed_loop_trajectory)
      and cache qpos to tests/golden/speed_ref_150.npz.
  SMPLSIM_QP_ITERS=8 SMPLSIM_QP_TOL=1e-3 python tools/calibrate_solver.py run
      Run OUR env (f32 + f64) under the current solver setting against the
      golden trajectory; print one JSON line with the error curve summary.
  python tools/calibrate_solver.py sweep
      Fork `run` over a grid of settings, write CALIBRATION_r03.json.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden", "speed_ref_150.npz")
STEPS = 150
TAR_SPEED = 2.0


def action_seq(nu):
    import numpy as np

    rng = np.random.RandomState(7)
    return np.stack([rng.uniform(-0.3, 0.3, nu) for _ in range(STEPS)])


def make_golden():
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import ref_shim

    ref_shim.import_reference()
    from smpl_sim.envs.tasks.humanoid_speed import HumanoidSpeed as RefSpeed

    cfg = ref_shim.default_cfg(task="HumanoidSpeed")
    env = RefSpeed(cfg)
    ref_shim.CURRENT_DATA[0] = env.mj_data
    env.reset(seed=0)
    env._tar_speed = TAR_SPEED
    env._speed_change_steps = 10**9

    acts = action_seq(env.get_action_size())
    qpos = []
    for t in range(STEPS):
        env.step(acts[t])
        qpos.append(env.get_qpos().copy())
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, qpos=np.asarray(qpos), actions=acts,
                        tar_speed=TAR_SPEED)
    print(f"golden written: {GOLDEN} ({STEPS} steps)")


def run_ours():
    import numpy as np

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    import jax

    # the sitecustomize hook registers the axon (remote TPU) backend before
    # env vars are consulted; config.update is the only reliable override
    # (same trick as tests/conftest.py)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # f64 MUST be real f64 (without this jnp.float64 silently downcasts and
    # the "f64" row would just re-run f32)
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from smplsim_tpu.envs import HumanoidSpeed
    from smplsim_tpu.models import registry
    from smplsim_tpu.ops import qp_kernel

    gold = np.load(GOLDEN)
    qpos_ref, acts = gold["qpos"], gold["actions"]

    out = {
        "iters": qp_kernel.NEWTON_ITERS,
        "tol": qp_kernel._TOLS[jnp.dtype(jnp.float32)],
        "platform": jax.default_backend(),
    }
    # f32 rounding alone walks the chaotic trajectory off the f64 golden
    # around t~50, so loose-setting f32 runs are ALSO compared against the
    # tight-setting f32 trajectory (cached next to the golden): the solver-
    # induced divergence must stay well under the precision-induced one.
    tight_f32_path = GOLDEN.replace(".npz", "_ours_f32_tight.npy")
    for dtype, name in ((jnp.float32, "f32"), (jnp.float64, "f64")):
        if dtype == jnp.float64 and jax.default_backend() != "cpu":
            continue  # TPU has no f64
        model = registry.default_humanoid(dtype=dtype)
        env = HumanoidSpeed(model)
        st = env.reset(jax.random.PRNGKey(0))
        st = st.replace(task=st.task.replace(
            tar_speed=jnp.asarray(TAR_SPEED, dtype),
            change_step=jnp.asarray(10**9, jnp.int32),
        ))
        step = jax.jit(env.step)
        qpos_ours, stalls = [], []
        for t in range(STEPS):
            st = step(st, jnp.asarray(acts[t], dtype))
            qpos_ours.append(np.asarray(st.phys.qpos, np.float64))
            stalls.append(bool(st.info["stalled"]))
        qpos_ours = np.asarray(qpos_ours)
        errs = np.abs(qpos_ours - qpos_ref).max(axis=1)
        first_bad = int(np.argmax(errs > 1e-2)) if (errs > 1e-2).any() else -1
        out[name] = {
            "max_err_150": float(errs.max()),
            "err_at": {str(t): float(errs[t]) for t in (9, 49, 99, 149)},
            "first_step_over_1e-2": first_bad,
            "stalled_frac": float(np.mean(stalls)),
        }
        if name == "f32":
            from smplsim_tpu.physics import solver

            is_tight = (qp_kernel.NEWTON_ITERS >= 40
                        and out["tol"] <= 1.1e-6
                        and solver.COMPACT_ROWS >= 64)
            if is_tight:
                np.save(tight_f32_path, qpos_ours)
            elif os.path.exists(tight_f32_path):
                tight = np.load(tight_f32_path)
                errs_t = np.abs(qpos_ours - tight).max(axis=1)
                fb = (int(np.argmax(errs_t > 1e-2))
                      if (errs_t > 1e-2).any() else -1)
                out["f32_vs_tight"] = {
                    "max_err_150": float(errs_t.max()),
                    "err_at": {str(t): float(errs_t[t])
                               for t in (9, 49, 99, 149)},
                    "first_step_over_1e-2": fb,
                }
    print(json.dumps(out))
    return out


def sweep():
    settings = [
        (40, "1e-6"),   # parity default
        (24, "1e-5"),
        (16, "1e-4"),
        (12, "1e-4"),
        (12, "1e-3"),
        (8, "1e-3"),
        (6, "1e-2"),
        (4, "1e-2"),
    ]
    results = []
    for iters, tol in settings:
        env = dict(os.environ)
        env["SMPLSIM_QP_ITERS"] = str(iters)
        env["SMPLSIM_QP_TOL"] = tol
        env["JAX_PLATFORMS"] = "cpu"  # calibration compares vs the CPU golden
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "run"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"iters={iters} tol={tol} FAILED:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            continue
        r = json.loads(line[-1])
        results.append(r)
        print(json.dumps(r))
    with open(os.path.join(REPO, "CALIBRATION_r03.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote CALIBRATION_r03.json")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "golden":
        make_golden()
    elif mode == "run":
        run_ours()
    elif mode == "sweep":
        sweep()
    else:
        raise SystemExit(f"unknown mode {mode}")
