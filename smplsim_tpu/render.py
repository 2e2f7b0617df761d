"""Offline rollout rendering: geom-level matplotlib -> GIF.

The reference dumps eval videos through mujoco.Renderer + imageio
(smpl_sim/envs/base_env.py:148-201). This machine has no GL backend
(OSMesa/EGL unavailable) and no ffmpeg, so the TPU-native equivalent draws
the robot's actual collision geoms (capsules as thick segments, boxes as
filled faces, spheres as discs) with matplotlib's 3-D axes and writes an
animated GIF via imageio — enough to visually validate physics plausibility
and policy behavior offline. For pixel-accurate rendering, export the MJCF
(models/mjcf.py) and replay the recorded qpos through mujoco.Renderer on a
machine with GL.
"""
from __future__ import annotations

import numpy as np

from smplsim_tpu import transforms as T
from smplsim_tpu.models.spec import GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, RobotModel


def _geom_world_np(model: RobotModel, xpos, xmat, g):
    b = model.geom_body[g]
    R_b = xmat[b]
    pos = xpos[b] + R_b @ np.asarray(model.geom_pos[g])
    quat = np.asarray(model.geom_quat[g])
    Rg = R_b @ np.asarray(T.quat_to_matrix(quat))
    return pos, Rg


_BOX_FACES = [
    (0, 1, 3, 2), (4, 5, 7, 6), (0, 1, 5, 4),
    (2, 3, 7, 6), (0, 2, 6, 4), (1, 3, 7, 5),
]


def draw_frame(ax, model: RobotModel, qpos, color="#3070b0", floor=True,
               kin_np=None):
    """Draw one pose's geoms onto a 3-D matplotlib axis. `kin_np` optionally
    provides precomputed (xpos, xmat) — per-frame eager FK through a remote
    TPU tunnel costs seconds in dispatch alone."""
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    if kin_np is None:
        import jax.numpy as jnp

        from smplsim_tpu.physics import kinematics

        kin = kinematics.fk(model, jnp.asarray(qpos))
        xpos, xmat = np.asarray(kin.xpos), np.asarray(kin.xmat)
    else:
        xpos, xmat = kin_np

    if floor:
        s = 1.5
        ax.add_collection3d(Poly3DCollection(
            [[(-s, -s, 0), (s, -s, 0), (s, s, 0), (-s, s, 0)]],
            facecolor="#dddddd", alpha=0.4, zorder=0,
        ))

    for g, t in enumerate(model.geom_type):
        pos, Rg = _geom_world_np(model, xpos, xmat, g)
        size = np.asarray(model.geom_size[g])
        if t == GEOM_CAPSULE:
            a = pos - Rg[:, 2] * size[1]
            b = pos + Rg[:, 2] * size[1]
            lw = max(size[0] * 150, 2.0)
            ax.plot(*zip(a, b), lw=lw, color=color,
                    solid_capstyle="round", alpha=0.9)
        elif t == GEOM_SPHERE:
            ax.plot([pos[0]], [pos[1]], [pos[2]], "o",
                    ms=max(size[0] * 180, 4), color=color, alpha=0.9)
        elif t == GEOM_BOX:
            corners = np.array([
                pos + Rg @ (size * np.array([sx, sy, sz]))
                for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
            ])
            ax.add_collection3d(Poly3DCollection(
                [[corners[i] for i in face] for face in _BOX_FACES],
                facecolor=color, edgecolor="k", lw=0.2, alpha=0.8,
            ))


def render_rollout(
    model: RobotModel,
    qpos_traj,
    path: str,
    fps: int = 30,
    every: int = 1,
    figsize=(5, 5),
    follow: bool = True,
):
    """Render a (T, nq) qpos trajectory to `path` (.gif or .mp4).

    The container is chosen by extension: .mp4 encodes through OpenCV
    (mp4v — no ffmpeg on this image), anything else goes through imageio's
    GIF writer. This is the GL-free stand-in for the reference's offscreen
    mujoco.Renderer + imageio mp4 dump (smpl_sim/envs/base_env.py:148-201).
    `every` subsamples frames (every=2 halves the frame count). `follow`
    keeps the camera centered on the root. Returns the number of frames
    written.
    """
    import imageio.v2 as imageio
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    import jax.numpy as jnp

    from smplsim_tpu.physics import kinematics

    qpos_traj = np.asarray(qpos_traj)[::every]
    # ONE batched device call for all frames' FK, host-side drawing after
    kin = jax.jit(jax.vmap(lambda q: kinematics.fk(model, q)))(
        jnp.asarray(qpos_traj)
    )
    xpos_all = np.asarray(kin.xpos)
    xmat_all = np.asarray(kin.xmat)
    frames = []
    fig = plt.figure(figsize=figsize, dpi=80)
    for i, qpos in enumerate(qpos_traj):
        fig.clf()
        ax = fig.add_subplot(111, projection="3d")
        draw_frame(ax, model, qpos, kin_np=(xpos_all[i], xmat_all[i]))
        c = qpos[0:3] if follow else np.zeros(3)
        ax.set_xlim(c[0] - 1.0, c[0] + 1.0)
        ax.set_ylim(c[1] - 1.0, c[1] + 1.0)
        ax.set_zlim(0.0, 2.0)
        ax.set_box_aspect((1, 1, 1))
        ax.axis("off")
        fig.tight_layout(pad=0)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
    plt.close(fig)
    if path.lower().endswith(".mp4"):
        import cv2

        h, w = frames[0].shape[:2]
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps / every, (w, h)
        )
        if not vw.isOpened():
            raise RuntimeError(f"cv2.VideoWriter failed to open {path}")
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
    else:
        imageio.mimsave(path, frames, duration=1000.0 / (fps / every), loop=0)
    return len(frames)
