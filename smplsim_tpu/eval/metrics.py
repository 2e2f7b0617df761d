"""Imitation / motion-tracking metrics, JAX-native and batched.

Port of the reference eval harness (smpl_sim/smpllib/smpl_eval.py): global
and root-relative MPJPE, Procrustes-aligned MPJPE (p_mpjpe:98-137), velocity
and acceleration errors (:281-336), success TTR (global MPJPE < 120 mm,
:47), floor penetration and foot skate (:207-233), and the root-pose
Frobenius error (:262-270). All functions are jit/vmap-friendly; inputs are
(T, J, 3) position arrays in meters, outputs in millimeters where the
reference reports mm.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mpjpe_global(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """(T,J,3),(T,J,3) -> (T,J) global per-joint position error [mm]."""
    return jnp.linalg.norm(gt - pred, axis=-1) * 1000.0


def mpjpe_local(pred: jax.Array, gt: jax.Array, root_idx: int = 0) -> jax.Array:
    """Root-relative MPJPE [mm]."""
    pred = pred - pred[:, root_idx : root_idx + 1]
    gt = gt - gt[:, root_idx : root_idx + 1]
    return jnp.linalg.norm(gt - pred, axis=-1) * 1000.0


def p_mpjpe(predicted: jax.Array, target: jax.Array) -> jax.Array:
    """Procrustes-aligned MPJPE ("Protocol #2"), (T,J,3) -> (T,J) in input
    units (reference p_mpjpe returns meters; callers scale to mm)."""
    muX = jnp.mean(target, axis=1, keepdims=True)
    muY = jnp.mean(predicted, axis=1, keepdims=True)
    X0 = target - muX
    Y0 = predicted - muY
    normX = jnp.sqrt(jnp.sum(X0**2, axis=(1, 2), keepdims=True))
    normY = jnp.sqrt(jnp.sum(Y0**2, axis=(1, 2), keepdims=True))
    X0 = X0 / normX
    Y0 = Y0 / normY
    H = jnp.matmul(jnp.swapaxes(X0, 1, 2), Y0)
    U, s, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, 1, 2)
    R = jnp.matmul(V, jnp.swapaxes(U, 1, 2))
    sign_detR = jnp.sign(jnp.linalg.det(R))[:, None]
    V = V.at[:, :, -1].multiply(sign_detR)
    s = s.at[:, -1].multiply(sign_detR[:, 0])
    R = jnp.matmul(V, jnp.swapaxes(U, 1, 2))
    tr = jnp.sum(s, axis=1, keepdims=True)[:, :, None]
    a = tr * normX / normY
    t = muX - a * jnp.matmul(muY, R)
    predicted_aligned = a * jnp.matmul(predicted, R) + t
    return jnp.linalg.norm(predicted_aligned - target, axis=-1)


def compute_vel(joints: jax.Array) -> jax.Array:
    """(T,J,3) -> (T-1,) mean per-frame joint displacement norm."""
    v = joints[1:] - joints[:-1]
    return jnp.mean(jnp.linalg.norm(v, axis=-1), axis=-1)


def compute_accel(joints: jax.Array) -> jax.Array:
    """(T,J,3) -> (T-2,) mean second-difference norm."""
    a = joints[:-2] - 2 * joints[1:-1] + joints[2:]
    return jnp.mean(jnp.linalg.norm(a, axis=-1), axis=-1)


def compute_error_vel(joints_gt: jax.Array, joints_pred: jax.Array) -> jax.Array:
    vg = joints_gt[1:] - joints_gt[:-1]
    vp = joints_pred[1:] - joints_pred[:-1]
    return jnp.mean(jnp.linalg.norm(vp - vg, axis=-1), axis=-1)


def compute_error_accel(joints_gt: jax.Array, joints_pred: jax.Array) -> jax.Array:
    ag = joints_gt[:-2] - 2 * joints_gt[1:-1] + joints_gt[2:]
    ap = joints_pred[:-2] - 2 * joints_pred[1:-1] + joints_pred[2:]
    return jnp.mean(jnp.linalg.norm(ap - ag, axis=-1), axis=-1)


def compute_penetration(verts: jax.Array, floor_z: float = 0.0) -> jax.Array:
    """(T,V,3) -> (T,) mean penetration depth below the floor [mm]."""
    below = floor_z - verts[..., 2]
    pen = jnp.where(below > 0, below, 0.0)
    cnt = jnp.sum(below > 0, axis=-1)
    return jnp.where(cnt > 0, jnp.sum(pen, axis=-1) / jnp.maximum(cnt, 1), 0.0) * 1000.0


def compute_skate(verts: jax.Array, floor_z: float = 0.0) -> jax.Array:
    """(T,V,3) -> (T-1,) mean horizontal slip of grounded vertices [mm]."""
    grounded = (verts[:-1, :, 2] <= floor_z) & (verts[1:, :, 2] <= floor_z)
    offset = jnp.linalg.norm(verts[1:, :, :2] - verts[:-1, :, :2], axis=-1)
    cnt = jnp.sum(grounded, axis=-1)
    s = jnp.sum(jnp.where(grounded, offset, 0.0), axis=-1)
    return jnp.where(cnt > 0, s / jnp.maximum(cnt, 1), 0.0) * 1000.0


def frobenius_root_error(x_mats: jax.Array, y_mats: jax.Array) -> jax.Array:
    """Mean || I - X Y^-1 ||_F over (T,4,4) homogeneous root poses
    (reference get_frobenious_norm)."""
    y_inv = jnp.linalg.inv(y_mats)
    err = jnp.eye(4) - jnp.matmul(x_mats, y_inv)
    return jnp.mean(jnp.linalg.norm(err, axis=(-2, -1)))


def compute_metrics_lite(
    pred_pos: jax.Array,  # (T,J,3)
    gt_pos: jax.Array,
    root_idx: int = 0,
) -> dict[str, jax.Array]:
    """Reference compute_metrics_lite for one sequence; vmap for batches."""
    mg = mpjpe_global(pred_pos, gt_pos)
    vel = compute_error_vel(gt_pos, pred_pos) * 1000.0
    acc = compute_error_accel(gt_pos, pred_pos) * 1000.0
    p_l = pred_pos - pred_pos[:, root_idx : root_idx + 1]
    g_l = gt_pos - gt_pos[:, root_idx : root_idx + 1]
    ml = jnp.linalg.norm(p_l - g_l, axis=-1) * 1000.0
    mpa = p_mpjpe(p_l, g_l) * 1000.0
    return {
        "mpjpe_g": mg,
        "mpjpe_l": ml,
        "mpjpe_pa": mpa,
        "vel_dist": vel,
        "accel_dist": acc,
        "ttr": jnp.mean(mg, axis=-1) < 120.0,  # success criterion (smpl_eval.py:47)
    }
