"""2-D-keypoint pose fitting: differentiable reprojection losses + optimizer.

Rebuild of the reference's autograd pose fitter
(smpl_sim/smpllib/np_smpl_humanoid_batch.py:31-305): camera projection of
FK'd joints onto OpenPose-style 2-D detections, with the same loss family —
weighted-L2 reprojection (`proj_2d_loss`), camera-ray line loss
(`proj_2d_line_loss`), root-centered body loss (`proj_2d_body_loss`), and
root-only loss (`proj_2d_root_loss`). The reference differentiates numpy via
the autograd package; here the losses are plain jnp and `fit()` runs jitted
Adam — the whole optimization stays on device.

Input vector layout matches the reference fk_batch_grad
(np_smpl_humanoid_batch.py:331-350): (T, 1, 3+J*3) = [trans | root aa |
body aa], SMPL joint order.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smplsim_tpu.motion.fk import HumanoidBatchFK

# SMPL joint index for each of the 25 OpenPose joints (standard smpl2op map;
# entries >= 22 have no SMPL correspondence and are dropped like the
# reference's openpose_subindex mask, np_smpl_humanoid_batch.py:201-206)
SMPL2OP_MAP = np.array(
    [24, 12, 17, 19, 21, 16, 18, 20, 0, 2, 5, 8, 1, 4, 7, 25, 26, 27, 28,
     29, 30, 31, 32, 33, 34]
)


def smpl_op_to_op(pred_joints2d: jax.Array) -> jax.Array:
    """SMPL-subset keypoints -> OpenPose-14 layout: synthesize neck/hip
    midpoints (np_smpl_humanoid_batch.py:31-39)."""
    return jnp.concatenate(
        [
            pred_joints2d[..., [1, 4], :].mean(axis=-2, keepdims=True),
            pred_joints2d[..., 1:7, :],
            pred_joints2d[..., [7, 8, 11], :].mean(axis=-2, keepdims=True),
            pred_joints2d[..., 9:11, :],
            pred_joints2d[..., 12:, :],
        ],
        axis=-2,
    )


def normalize_screen_coordinates(X, w: float = 1920, h: float = 1080):
    """[0,w]x[0,h] -> [-1,1] preserving aspect (np_smpl_humanoid_batch.py:41)."""
    return X / w * 2 - jnp.asarray([1.0, h / w], X.dtype)


@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Extrinsics/intrinsics (reference cam_params dict)."""

    full_R: np.ndarray   # (3,3)
    full_t: np.ndarray   # (3,)
    K: np.ndarray        # (3,3)
    img_w: float = 1920.0
    img_h: float = 1080.0


class PoseFitter:
    """Fit (trans, pose_aa) sequences to per-frame 2-D keypoints."""

    def __init__(
        self,
        fk: HumanoidBatchFK,
        cam: CameraParams,
        smpl2op_map: np.ndarray | None = None,
        recency_lambda: float = 0.3,
    ):
        self.fk = fk
        self.cam = cam
        smpl2op_map = SMPL2OP_MAP if smpl2op_map is None else smpl2op_map
        self.openpose_subindex = smpl2op_map < 22
        self.smpl2op_partial = smpl2op_map[self.openpose_subindex]
        self.recency_lambda = recency_lambda
        self._R = jnp.asarray(cam.full_R)
        self._t = jnp.asarray(cam.full_t)
        self._K = jnp.asarray(cam.K)
        self._Kinv = jnp.asarray(np.linalg.inv(cam.K))

    # ---------------- targets ----------------
    def set_targets(self, tgt_joints_2d, inliers=None):
        """tgt_joints_2d (T, K2, 2) pixel coords; inliers bool same shape[:-1].
        Precomputes camera rays + exponential recency weighting
        (np_smpl_humanoid_batch.py:208-225)."""
        tgt = jnp.asarray(tgt_joints_2d)
        Tn, K2 = tgt.shape[0], tgt.shape[1]
        self.gt_2d = tgt
        self.gt_2d_norm = normalize_screen_coordinates(
            tgt, self.cam.img_w, self.cam.img_h
        )
        self.inliers = (
            jnp.ones((Tn, K2), bool) if inliers is None else jnp.asarray(inliers, bool)
        )
        rays = jnp.concatenate([tgt, jnp.ones((Tn, K2, 1), tgt.dtype)], axis=2)
        rays = rays @ self._Kinv.T
        self.camera_rays = rays / jnp.linalg.norm(rays, axis=2, keepdims=True)
        lam = self.recency_lambda
        w = jnp.exp(-lam * jnp.arange(Tn))
        w = w / w.sum()
        self.weighting = jnp.tile(w[:, None, None], (1, K2, 2))

    # ---------------- forward ----------------
    def fk_from_vec(self, input_vec: jax.Array) -> jax.Array:
        """(T,1,3+J*3) -> world body pos (T,J,3) mujoco-ordered
        (fk_batch_grad, np_smpl_humanoid_batch.py:331-350)."""
        Tn = input_vec.shape[0]
        vec = input_vec.reshape(Tn, -1)
        trans = vec[:, :3][None]                      # (1,T,3)
        pose_aa = vec[:, 3:].reshape(1, Tn, -1, 3)    # (1,T,J,3) SMPL order
        out = self.fk.fk_batch(pose_aa, trans, count_offset=True)
        return out["global_translation"][0]           # (T,J,3)

    def proj2d(self, wbpos: jax.Array, return_cam_3d: bool = False):
        """Mujoco-ordered world joints -> OpenPose-layout 2-D pixels
        (np_smpl_humanoid_batch.py:227-242)."""
        mujoco_2_smpl = np.asarray(self.fk.mujoco_2_smpl)
        p3 = wbpos[:, mujoco_2_smpl][:, self.smpl2op_partial]   # (T,K,3)
        p3 = p3 @ self._R.T + self._t
        p2 = p3 @ self._K.T
        p2 = p2[..., :2] / p2[..., 2:]
        p2 = smpl_op_to_op(p2)
        return (p2, p3) if return_cam_3d else p2

    # ---------------- losses ----------------
    def proj_2d_loss(self, input_vec, ord: int = 2, normalize: bool = True):
        pred = self.proj2d(self.fk_from_vec(input_vec))
        if normalize:
            pred = normalize_screen_coordinates(pred, self.cam.img_w, self.cam.img_h)
            gt = self.gt_2d_norm
        else:
            gt = self.gt_2d
        if ord == 1:
            mask = self.inliers[..., None]
            err = jnp.abs(gt - pred) * mask
            return err.sum() / jnp.maximum(mask.sum(), 1)
        diff = (gt - pred) ** 2
        w = self.weighting * self.inliers[..., None]
        return (diff * w).sum(axis=0).mean()

    def proj_2d_line_loss(self, input_vec):
        """Squared distance of camera-frame joints to the detection rays
        (np_smpl_humanoid_batch.py:244-249). The 3-D joints go through the
        same OpenPose merge as the 2-D targets so both sides share a layout."""
        _, p3 = self.proj2d(self.fk_from_vec(input_vec), return_cam_3d=True)
        p3 = smpl_op_to_op(p3)
        dist = jnp.cross(p3, p3 - self.camera_rays) ** 2
        return dist.mean()

    def proj_2d_body_loss(self, input_vec, ord: int = 2, normalize: bool = False):
        """Root-centered variant: shift prediction so joint 8 (mid-hip)
        coincides with the target's before the loss
        (np_smpl_humanoid_batch.py:272-295)."""
        pred = self.proj2d(self.fk_from_vec(input_vec))
        pred = pred + (self.gt_2d[..., 7:8, :] - pred[..., 7:8, :])
        if normalize:
            pred = normalize_screen_coordinates(pred, self.cam.img_w, self.cam.img_h)
            gt = self.gt_2d_norm
        else:
            gt = self.gt_2d
        if ord == 1:
            mask = self.inliers[..., None]
            err = jnp.abs(gt - pred) * mask
            return err.sum() / jnp.maximum(mask.sum(), 1)
        diff = (gt - pred) ** 2
        w = self.weighting * self.inliers[..., None]
        return (diff * w).sum(axis=0).mean()

    def proj_2d_root_loss(self, root_pos_rot):
        """Root-only L1 on the mid-hip keypoint
        (np_smpl_humanoid_batch.py:297-305)."""
        J = self.fk.num_joints
        vec = jnp.concatenate(
            [root_pos_rot.reshape(1, 1, 6),
             jnp.zeros((1, 1, (J - 1) * 3), root_pos_rot.dtype)], axis=2
        )
        pred = self.proj2d(self.fk_from_vec(vec))
        return jnp.abs(self.gt_2d[..., 7:8, :][:1] - pred[..., 7:8, :]).mean()

    # ---------------- optimization ----------------
    def fit(
        self,
        input_vec0: jax.Array,
        loss: str | Callable = "proj_2d_loss",
        steps: int = 200,
        lr: float = 0.02,
    ):
        """Jitted Adam descent on the chosen loss. Returns (vec, losses)."""
        loss_fn = getattr(self, loss) if isinstance(loss, str) else loss
        tx = optax.adam(lr)

        def step(carry, _):
            vec, opt = carry
            val, g = jax.value_and_grad(loss_fn)(vec)
            upd, opt = tx.update(g, opt)
            return (optax.apply_updates(vec, upd), opt), val

        (vec, _), losses = jax.lax.scan(
            step, (input_vec0, tx.init(input_vec0)), None, length=steps
        )
        return vec, losses
