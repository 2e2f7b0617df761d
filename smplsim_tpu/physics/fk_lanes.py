"""Forward kinematics, batch-in-lanes formulation.

`kinematics.fk` vmapped over envs runs the 24-body chain as (B,3,3) @
(B,3,3) batched matmuls and (B,3) elementwise chains whose 3-wide minor
dims pad to full (8,128) TPU tiles — the same ~40x lane waste the contact
manifolds had before the lanes rewrites (boxbox r2, capsule-box r2). This
module is the SAME chain with the env axis B as the MINOR dimension: every
rotation is a (3,3,B) array, every 3x3 product is a broadcast-multiply-
reduce over the tiny static dims at full lane width — no batched matmul,
and a bounded HLO op count (~350; a scalarized formulation at ~5k ops
stalled XLA's CPU pipeline for minutes).

Exposed through `kinematics.fk`'s custom_vmap rule: per-env calls use the
reference routine (and its jvp — iLQR jacfwds go through the plain path);
under the engine's env vmap the whole batch lands here. Model fields may
be shared ((J, ...) arrays broadcast across lanes) or per-env
(β-heterogeneous stacks, pre-moved to (J, ..., B)).

Replaces mujoco.mj_kinematics on the batched hot path (reference reads
body state via sensors, smpl_sim/envs/humanoid_env.py:539-544).
"""
from __future__ import annotations

import jax.numpy as jnp


def _mm(A, B):
    """(3,3,B) @ (3,3,B) -> (3,3,B): C[i,j] = sum_k A[i,k] B[k,j]."""
    return (A[:, :, None, :] * B[None, :, :, :]).sum(1)


def _mv(A, v):
    """(3,3,B) @ (3,B)/(3,) -> (3,B)."""
    v = v[:, None] if v.ndim == 1 else v
    return (A * v[None]).sum(1)


def _cross(a, b):
    """(...,3,B) x (...,3,B) along the 3-axis (second to last)."""
    ax, ay, az = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    bx, by, bz = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-2
    )


def fk_lanes(qT, body_pos, body_R_local, body_ipos, body_inertia, parents):
    """Lanes-last FK. qT (nq, B); model fields (J, ...) shared or
    (J, ..., B) per-env. Returns (xpos (J,3,B), xmat (J,3,3,B),
    S (nv,6,B), com (J,3,B), inertia_w (J,3,3,B)) — the exact per-env
    `kinematics.fk` outputs with the batch axis moved last."""
    J = len(parents)
    B = qT.shape[-1]
    dtype = qT.dtype

    # root rotation from the raw wxyz quat (same formula as
    # transforms.quat_to_matrix — no normalization, matching per-env fk)
    w, x, y, z = qT[3], qT[4], qT[5], qT[6]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    root_R = jnp.stack([
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)]),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)]),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]),
    ])  # (3,3,B)

    hinge = qT[7:].reshape(J - 1, 3, B)
    ca = jnp.cos(hinge)
    sa = jnp.sin(hinge)

    xpos = [qT[0:3]]                      # list of (3,B)
    xmat = [root_R]                       # list of (3,3,B)
    f0x, f1y, f2z = [], [], []            # world hinge axes, (3,B) each

    for b in range(1, J):
        p = parents[b]
        Rp = xmat[p]
        bp = body_pos[b]                  # (3,) or (3,B)
        pos = xpos[p] + _mv(Rp, bp)
        L = body_R_local[b]               # (3,3) or (3,3,B)
        F0 = _mm(Rp, L[:, :, None] if L.ndim == 2 else L)
        i = b - 1
        cx, cy, cz = ca[i, 0], ca[i, 1], ca[i, 2]
        sx, sy, sz = sa[i, 0], sa[i, 1], sa[i, 2]
        # F1 = F0 @ Rx, F2 = F1 @ Ry, R = F2 @ Rz — column updates only
        F1 = jnp.stack(
            [F0[:, 0], F0[:, 1] * cx + F0[:, 2] * sx,
             -F0[:, 1] * sx + F0[:, 2] * cx], axis=1)
        F2 = jnp.stack(
            [F1[:, 0] * cy - F1[:, 2] * sy, F1[:, 1],
             F1[:, 0] * sy + F1[:, 2] * cy], axis=1)
        R = jnp.stack(
            [F2[:, 0] * cz + F2[:, 1] * sz,
             -F2[:, 0] * sz + F2[:, 1] * cz, F2[:, 2]], axis=1)
        xpos.append(pos)
        xmat.append(R)
        f0x.append(F0[:, 0])
        f1y.append(F1[:, 1])
        f2z.append(F2[:, 2])

    xpos_a = jnp.stack(xpos)              # (J,3,B)
    xmat_a = jnp.stack(xmat)              # (J,3,3,B)

    # ---- dof motion subspaces about the world origin
    zeros33 = jnp.zeros((3, 3, B), dtype)
    eye33 = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[:, :, None], (3, 3, B))
    S_trans = jnp.concatenate([zeros33, eye33], axis=1)        # (3,6,B)
    p0 = qT[0:3]
    rot_axes = jnp.swapaxes(root_R, 0, 1)                      # (3,3,B) rows
    S_rot = jnp.concatenate(
        [rot_axes, _cross(jnp.broadcast_to(p0[None], (3, 3, B)), rot_axes)],
        axis=1,
    )
    # hinge axes interleaved (x of F0, y of F1, z of F2 per body)
    hx = jnp.stack(f0x)                                        # (J-1,3,B)
    hy = jnp.stack(f1y)
    hz = jnp.stack(f2z)
    hinge_axes = jnp.stack([hx, hy, hz], axis=1).reshape(3 * (J - 1), 3, B)
    anchors = jnp.repeat(xpos_a[1:], 3, axis=0)                # (3(J-1),3,B)
    S_hinge = jnp.concatenate(
        [hinge_axes, _cross(anchors, hinge_axes)], axis=1)
    S = jnp.concatenate([S_trans, S_rot, S_hinge], axis=0)     # (nv,6,B)

    # ---- COM and world inertia
    ip = body_ipos if body_ipos.ndim == 3 else body_ipos[:, :, None]
    com = xpos_a + (xmat_a * ip[:, None, :]).sum(2)            # (J,3,B)
    Ib = body_inertia if body_inertia.ndim == 4 else body_inertia[..., None]
    T1 = (xmat_a[:, :, :, None, :] * Ib[:, None, :, :]).sum(2)  # (J,3,3,B)
    inertia_w = (T1[:, :, None, :, :] * xmat_a[:, None, :, :, :]).sum(3)
    return xpos_a, xmat_a, S, com, inertia_w
