"""End-to-end eval of a trained policy with eval/metrics (VERDICT r4 #3).

Loads the latest checkpoint of an experiment, runs deterministic eval
rollouts (agents.run_policy with trajectory recording), then computes the
physical-plausibility slice of eval/metrics.py on the recorded body
trajectories (penetration and skate need only the rollout; the mpjpe family
needs a mocap reference and is exercised on synthetic pairs in
tests/test_eval_metrics.py). Writes <out_dir>/eval_metrics.json.

    python tools/eval_policy_r5.py exp_name=speed_r5 env=speed
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


def main():
    from smplsim_tpu.agents import AgentHumanoid, RunConfig, parse_cli_overrides
    from smplsim_tpu.eval import metrics as M
    from smplsim_tpu.physics import kinematics

    argv = sys.argv[1:] + ["test=true", "epoch=-1"]
    cfg = parse_cli_overrides(RunConfig(), argv)
    agent = AgentHumanoid(cfg)
    rec_path = os.path.join(agent.out_dir, "eval_rollout.pkl")
    out = agent.run_policy(n_episodes=8, horizon=300, record_path=rec_path)

    import joblib

    traj = joblib.load(rec_path)
    qpos = np.asarray(traj["qpos"])          # (T, E, nq) or (E, T, nq)
    if qpos.ndim == 3 and qpos.shape[0] == 300:
        qpos = np.swapaxes(qpos, 0, 1)       # (E, T, nq)
    model = agent.env.model

    fk = jax.jit(jax.vmap(lambda q: kinematics.fk(model, q).xpos))
    pens, skates = [], []
    for e in range(qpos.shape[0]):
        xpos = fk(jnp.asarray(qpos[e], jnp.float32))   # (T, J, 3)
        pens.append(float(M.compute_penetration(xpos) * 1000.0))
        skates.append(float(M.compute_skate(xpos) * 1000.0))

    rec = dict(out)
    rec.update({
        "penetration_mm_mean": float(np.mean(pens)),
        "skate_mm_mean": float(np.mean(skates)),
        "episodes": int(qpos.shape[0]),
        "platform": jax.default_backend(),
        "qp_iters": int(os.environ["SMPLSIM_QP_ITERS"]),
    })
    path = os.path.join(agent.out_dir, "eval_metrics.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(json.dumps(rec))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
