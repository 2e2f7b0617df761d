"""Kinematic motion playback through the env (reference examples/motion_test.py).

The reference loads an AMASS pkl, converts pose_aa to qpos, and teleports
mj_data.qpos frame-by-frame under an interactive viewer
(/root/reference/examples/motion_test.py:30-60). AMASS data is licensed and
not bundled, so this demo builds a short synthetic clip (a squat + arm
swing), loads it through the MotionLib pipeline, replays it through
HumanoidPlayback (each env step teleports to the next frame, exactly the
reference loop), and optionally renders an offline GIF.

    python examples/motion_test.py [--gif motion.gif]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def synthetic_clip(model, T=60, fps=30.0):
    """qpos/qvel arrays for a squat + arm-swing clip (no licensed data)."""
    nq, nv = model.nq, model.nv
    t = np.linspace(0, 2 * np.pi, T)
    qpos = np.tile(np.asarray(model.qpos0), (T, 1))
    qpos[:, 2] = 0.92 - 0.12 * (1 - np.cos(t)) / 2          # squat
    names = list(model.body_names)
    for side in ("L", "R"):
        b = names.index(f"{side}_Shoulder")
        dof = 6 + 3 * (b - 1)
        qpos[:, 1 + dof] = 0.8 * np.sin(t) * (1 if side == "L" else -1)
    qvel = np.zeros((T, nv))
    qvel[1:, :3] = (qpos[1:, :3] - qpos[:-1, :3]) * fps
    return qpos, qvel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gif", default=None)
    ap.add_argument("--frames", type=int, default=60)
    args = ap.parse_args()

    from smplsim_tpu.envs.legacy import HumanoidPlayback
    from smplsim_tpu.models import registry

    model = registry.default_humanoid(dtype=jnp.float32)
    qpos, qvel = synthetic_clip(model, args.frames)

    # minimal motion-lib shim: HumanoidPlayback reads qpos/qvel/length_starts
    class ClipLib:
        def __init__(self, qpos, qvel):
            self.qpos = jnp.asarray(qpos, jnp.float32)
            self.qvel = jnp.asarray(qvel, jnp.float32)
            self.length_starts = jnp.asarray([0], jnp.int32)
            self._motion_num_frames = jnp.asarray([qpos.shape[0]], jnp.int32)

        def num_current_motions(self):
            return 1

    env = HumanoidPlayback(model, ClipLib(qpos, qvel))
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    frames = []
    for t in range(args.frames):
        state = step(state, jnp.zeros(env.action_size, jnp.float32))
        frames.append(np.asarray(state.phys.qpos))
        if t % 15 == 0:
            print(f"frame {t:3d}: root z={float(state.phys.qpos[2]):.3f}")
    print(f"played {len(frames)} frames through HumanoidPlayback")

    if args.gif:
        from smplsim_tpu.render import render_rollout

        render_rollout(model, np.asarray(frames), args.gif, fps=30)
        print(f"wrote {args.gif}")


if __name__ == "__main__":
    main()
