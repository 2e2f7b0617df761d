"""Batched mocap forward kinematics: SMPL pose (axis-angle) -> MuJoCo-ordered
global body states + (qpos, qvel) trajectories.

JAX port of the reference Humanoid_Batch
(smpl_sim/smpllib/torch_smpl_humanoid_batch.py): fk_batch aa->quat->matrix,
per-joint chain (:172-202), finite-difference linear velocity with optional
Gaussian smoothing (:204-214), quaternion-difference angular velocity
(:216-228), dof_pos as intrinsic-XYZ euler with the temporal continuity fix
(:154-156, pytorch3d_transforms.fix_continous_dof:749-775), and the qpos /
qvel assembly (:165-168: qvel = [global root linvel, root-frame angvel,
dof vels]). The reference's own __main__ asserts this FK matches MuJoCo
xpos/xquat; ours is tested against MuJoCo directly (tests/test_motion.py).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from smplsim_tpu import transforms as T
from smplsim_tpu.motion import joint_names as JN


def gaussian_filter1d_time(x: jax.Array, sigma: float = 2.0) -> jax.Array:
    """ndimage.gaussian_filter1d along axis -3 (time), mode='nearest'."""
    radius = int(4.0 * sigma + 0.5)
    t = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k = jnp.asarray(k / k.sum(), x.dtype)
    # pad time axis with edge values, then correlate
    pad = [(0, 0)] * x.ndim
    pad[-3] = (radius, radius)
    xp = jnp.pad(x, pad, mode="edge")
    xm = jnp.moveaxis(xp, -3, -1)

    def corr(row):
        return jnp.correlate(row, k, mode="valid")

    flat = xm.reshape(-1, xm.shape[-1])
    out = jax.vmap(corr)(flat).reshape(xm.shape[:-1] + (-1,))
    return jnp.moveaxis(out, -1, -3)


def fix_continuous_dof(dof: jax.Array) -> jax.Array:
    """Temporal euler-angle continuity fix ((T,J,3) -> (T,J,3)).

    Sequential over time like the reference: when a joint's euler jumps by
    >= 3 rad (summed) between frames, switch to the alternative XYZ euler
    representation (pi+x, pi-y, pi+z, wrapped); applied up to twice.
    """

    def flip(d):
        alt = jnp.stack(
            [jnp.pi + d[..., 0], jnp.pi - d[..., 1], jnp.pi + d[..., 2]], -1
        )
        return T.normalize_angle(alt)

    def step(prev, cur):
        def attempt(cur):
            diff = jnp.abs(cur - prev).sum(-1)
            need = diff >= 3.0
            return jnp.where(need[:, None], flip(cur), cur)

        cur = attempt(attempt(cur))
        return cur, cur

    first = dof[0]
    _, rest = jax.lax.scan(step, first, dof[1:])
    return jnp.concatenate([first[None], rest], axis=0)


class HumanoidBatchFK:
    """FK over the mujoco-ordered humanoid tree with SMPL-ordered inputs."""

    def __init__(
        self,
        offsets: np.ndarray,          # (J,3) mujoco-ordered local offsets
        parents: list[int] | tuple,   # mujoco-ordered parents
        humanoid_type: str = "smpl",
        dt: float = 1.0 / 30.0,
        filter_vel: bool = True,
    ):
        self.offsets = jnp.asarray(np.round(np.asarray(offsets), 5))
        self.parents = tuple(int(p) for p in parents)
        self.humanoid_type = humanoid_type
        self.dt = dt
        self.filter_vel = filter_vel
        self.smpl_2_mujoco = JN.smpl_to_mujoco_perm(humanoid_type)
        self.mujoco_2_smpl = JN.mujoco_to_smpl_perm(humanoid_type)
        self.num_joints = len(self.parents)

    @classmethod
    def from_robot_model(cls, model, **kw):
        """Offsets/parents straight from a RobotModel (body_pos is the
        zero-pose joint offset table the XML was generated from)."""
        return cls(
            np.asarray(model.body_pos), model.parents,
            humanoid_type=model.humanoid_type, **kw,
        )

    # ------------------------------------------------------------------
    def fk_batch(
        self,
        pose_aa: jax.Array,   # (B,T,J,3) SMPL-ordered axis angle
        trans: jax.Array,     # (B,T,3)
        count_offset: bool = True,
        return_full: bool = False,
    ) -> dict[str, Any]:
        B, Tn, J, _ = pose_aa.shape
        dtype = pose_aa.dtype
        pose_quat = T.exp_map_to_quat(pose_aa)              # (B,T,J,4) wxyz
        if count_offset:
            trans = trans + self.offsets[0].astype(dtype)
        quat_mj = pose_quat[:, :, self.smpl_2_mujoco]       # mujoco order

        wpos, wquat = self._forward(quat_mj, trans)

        out: dict[str, Any] = {
            "global_translation": wpos,
            "global_rotation": wquat,
        }
        if not return_full:
            return out

        linvel = self._velocity(wpos)
        angvel = self._angular_velocity(wquat)
        out["global_velocity"] = linvel
        out["global_angular_velocity"] = angvel
        out["global_root_velocity"] = linvel[..., 0, :]
        out["global_root_angular_velocity"] = angvel[..., 0, :]
        out["local_rotation"] = pose_quat

        dof = T.quat_to_euler_xyz(quat_mj[..., 1:, :])      # (B,T,J-1,3)
        dof = jax.vmap(fix_continuous_dof)(dof)
        out["dof_pos"] = dof
        dof_vel = (dof[:, 1:] - dof[:, :-1]) / self.dt
        out["dof_vels"] = jnp.concatenate([dof_vel, dof_vel[:, -1:]], axis=1)
        out["fps"] = int(1.0 / self.dt)

        out["qpos"] = jnp.concatenate(
            [trans, quat_mj[..., 0, :], dof.reshape(B, Tn, -1)], axis=-1
        )
        root_R = T.quat_to_matrix(wquat[..., 0, :])          # (B,T,3,3)
        local_root_ang = jnp.einsum(
            "btij,bti->btj", root_R, out["global_root_angular_velocity"]
        )
        out["qvel"] = jnp.concatenate(
            [
                out["global_root_velocity"],
                local_root_ang,
                out["dof_vels"].reshape(B, Tn, -1),
            ],
            axis=-1,
        )
        return out

    # ------------------------------------------------------------------
    def _forward(self, quat_mj: jax.Array, trans: jax.Array):
        """Chain FK: local quats (B,T,J,4) + root pos (B,T,3) -> world."""
        pos = [trans]
        rot = [quat_mj[..., 0, :]]
        for b in range(1, self.num_joints):
            p = self.parents[b]
            off = self.offsets[b].astype(trans.dtype)
            pos.append(pos[p] + T.quat_rotate(rot[p], jnp.broadcast_to(off, trans.shape)))
            rot.append(T.quat_mul(rot[p], quat_mj[..., b, :]))
        return jnp.stack(pos, axis=-2), jnp.stack(rot, axis=-2)

    def _velocity(self, p: jax.Array) -> jax.Array:
        v = (p[:, 1:] - p[:, :-1]) / self.dt
        v = jnp.concatenate([v, v[:, -1:]], axis=1)
        if self.filter_vel:
            v = gaussian_filter1d_time(v)
        return v

    def _angular_velocity(self, q: jax.Array) -> jax.Array:
        # w[t] = angle-axis(q[t+1] q[t]^-1)/dt for t < T-1; zero at the last
        # frame (reference fills diff_quat_data[..., :-1] and leaves identity)
        dq = T.quat_mul(q[:, 1:], T.quat_conjugate(q[:, :-1]))
        dq = T.quat_unit(dq)
        angle, axis = T.quat_to_angle_axis(dq)
        w = axis * angle[..., None] / self.dt
        w = jnp.concatenate([w, jnp.zeros_like(w[:, :1])], axis=1)
        if self.filter_vel:
            w = gaussian_filter1d_time(w)
        return w

    # ------------------------------------------------------------------
    def qpos_to_pose_aa(self, qpos: jax.Array):
        """(N, nq) -> (root_pos (N,3), pose_aa (N,J,3) SMPL-ordered)
        (reference qpos_to_pose_aa_numpy:253-268)."""
        root_pos = qpos[:, :3] - self.offsets[0].astype(qpos.dtype)
        root_aa = T.quat_to_exp_map(qpos[:, 3:7])[:, None]
        dof = qpos[:, 7:].reshape(qpos.shape[0], -1, 3)
        body_quat = T.euler_xyz_to_quat(dof)
        body_aa = T.quat_to_exp_map(body_quat)
        pose_aa = jnp.concatenate([root_aa, body_aa], axis=1)
        return root_pos, pose_aa[:, self.mujoco_2_smpl]
