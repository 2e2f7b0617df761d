"""Render a motion as a skeleton animation (reference examples/vis_motion.py).

Without AMASS data this plays the baked humanoid's kinematic tree through a
procedural walk-like pose sweep; with a motion pkl it renders the clip.

Usage:
    python examples/vis_motion.py [motion=path/to/clip.pkl] [out=motion.gif]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax.numpy as jnp

from smplsim_tpu.models import registry
from smplsim_tpu.poselib import SkeletonMotion, SkeletonTree
from smplsim_tpu.poselib.visualization import (
    animate_skeleton_motion,
    plot_skeleton_motion_frames,
)


def procedural_motion(tree: SkeletonTree, T=60, fps=30):
    """Sinusoidal hip/knee swing on the baked skeleton."""
    from smplsim_tpu import transforms as Tr

    J = len(tree)
    t = np.linspace(0, 2 * np.pi, T)
    aa = np.zeros((T, J, 3))
    for name, axis, amp, phase in [
        ("L_Hip", 0, 0.6, 0.0), ("R_Hip", 0, 0.6, np.pi),
        ("L_Knee", 0, 0.8, np.pi / 2), ("R_Knee", 0, 0.8, 3 * np.pi / 2),
        ("L_Shoulder", 2, 0.4, np.pi), ("R_Shoulder", 2, 0.4, 0.0),
    ]:
        if name in tree:
            aa[:, tree.index(name), axis] = amp * np.sin(t + phase)
    quat = Tr.exp_map_to_quat(jnp.asarray(aa))
    # stand the (non-upright-built) SMPL body up: root = the base rotation
    base = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    quat = quat.at[:, 0].set(Tr.quat_mul(base, quat[:, 0]))
    root_t = jnp.stack(
        [jnp.zeros(T), jnp.zeros(T), jnp.full(T, 0.95)], axis=-1
    )
    return SkeletonMotion(tree, quat, root_t, fps=fps)


def main():
    kv = dict(a.split("=", 1) for a in sys.argv[1:])
    out = kv.get("out", "motion.gif")

    model = registry.default_humanoid(dtype=jnp.float64)
    tree = SkeletonTree.from_robot_model(model)

    if "motion" in kv:
        import joblib

        data = joblib.load(kv["motion"])
        clip = data[next(iter(data))] if isinstance(data, dict) else data
        from smplsim_tpu import transforms as Tr

        aa = np.asarray(clip["pose_aa"]).reshape(-1, 24, 3)
        quat = Tr.exp_map_to_quat(jnp.asarray(aa))
        # SMPL order -> tree (mujoco) order
        from smplsim_tpu.motion.joint_names import smpl_to_mujoco_perm

        quat = quat[:, np.asarray(smpl_to_mujoco_perm("smpl"))]
        motion = SkeletonMotion(
            tree, quat, jnp.asarray(clip["trans"]), fps=int(clip.get("fps", 30))
        )
    else:
        motion = procedural_motion(tree)

    grid = out.rsplit(".", 1)[0] + "_frames.png"
    plot_skeleton_motion_frames(motion, path=grid)
    print(f"wrote {grid}")
    animate_skeleton_motion(motion, out, stride=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
