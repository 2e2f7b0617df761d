"""Offline rollout rendering (reference examples/viewer_render.py).

The reference opens a GLFW viewer and dumps frames; this box is headless, so
the analogue rolls a policy (or random actions) through the speed env and
writes the episode to an animated GIF/MP4 via the geom-level offline
renderer (smplsim_tpu/render.py) — the same artifact
`run_policy(render_path=...)` produces after training.

    python examples/viewer_render.py out.gif [--steps 90]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="rollout.gif")
    ap.add_argument("--steps", type=int, default=90)
    args = ap.parse_args()

    from smplsim_tpu.envs import HumanoidSpeed
    from smplsim_tpu.models import registry
    from smplsim_tpu.render import render_rollout

    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step_autoreset)
    rng = np.random.RandomState(0)
    traj = []
    for _ in range(args.steps):
        a = jnp.asarray(rng.uniform(-0.3, 0.3, env.action_size), jnp.float32)
        state = step(state, a)
        traj.append(np.asarray(state.phys.qpos))
    render_rollout(model, np.asarray(traj), args.out, fps=30)
    print(f"wrote {args.out} ({len(traj)} frames)")


if __name__ == "__main__":
    main()
