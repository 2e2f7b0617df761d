"""Create and step the legacy dm-control-style locomotion env.

TPU-native analogue of the reference's examples/create_env.py (which builds
SMPLHumanoidMove, steps random actions, and renders interactively): here the
env is the functional HumanoidMove (180 Hz physics / 30 Hz control,
dm_control tolerance-shaped reward), stepped as a jitted vmapped batch, with
an optional offline GIF instead of a GLFW window (headless TPU box).

    python examples/create_env.py [--envs 16] [--steps 50] [--gif out.gif]
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
    ap.add_argument("--envs", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--move-speed", type=float, default=0.0)
    ap.add_argument("--gif", default=None)
    args = ap.parse_args()

    from smplsim_tpu.envs.legacy import HumanoidMove, MoveConfig
    from smplsim_tpu.models import registry

    model = registry.default_humanoid(dtype=jnp.float32)
    # the legacy dm-style path runs 180 Hz physics / 30 Hz control
    # (smplenv.py:31-32); retime the baked 450 Hz model accordingly
    model = model.replace(timestep=jnp.float32(1.0 / 180.0))
    env = HumanoidMove(model, MoveConfig(move_speed=args.move_speed))
    print(f"obs size: {env.obs_size}  action size: {env.action_size}")

    keys = jax.random.split(jax.random.PRNGKey(0), args.envs)
    states = jax.jit(jax.vmap(env.reset))(keys)
    vstep = jax.jit(jax.vmap(env.step_autoreset))

    qpos_hist = []
    rng = np.random.RandomState(0)
    for t in range(args.steps):
        a = jnp.asarray(rng.uniform(-0.3, 0.3, (args.envs, env.action_size)),
                        jnp.float32)
        states = vstep(states, a)
        qpos_hist.append(np.asarray(states.phys.qpos[0]))
        if t % 10 == 0:
            print(f"t={t:3d} reward mean={float(states.reward.mean()):.3f} "
                  f"done={int(states.done.sum())}")

    if args.gif:
        from smplsim_tpu.render import render_rollout

        render_rollout(model, np.asarray(qpos_hist), args.gif, fps=30)
        print(f"wrote {args.gif}")


if __name__ == "__main__":
    main()
