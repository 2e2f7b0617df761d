"""Mass matrix / bias forces, batch-in-lanes formulation.

`dynamics.mass_matrix` / `bias_forces` vmapped over envs run their
(J,6,6)-block einsums and (nv,6) elementwise chains with 6-wide minor dims
that pad to full (8,128) TPU tiles — ~20x memory/lane waste, the same
pathology the fk/contact lanes rewrites removed. This module is the SAME
origin-frame masked-matmul algebra (see physics/dynamics.py docstring) with
the env axis B as the MINOR dimension:

- static topology masks contract as single wide matmuls
  (nv,nv) @ (nv, 6B) — shared left operand, full MXU tiles;
- per-body 6-vector/6x6 work is broadcast-multiply-reduce over the tiny
  static dims at full lane width.

Exposed through custom_vmap rules in physics/dynamics.py: per-env calls use
the reference routines (and their jvps — MPC jacfwds go through the plain
path); under the engine's env vmap the whole batch lands here. Model fields
may be shared ((J,...)/(nv,...) broadcast across lanes) or per-env
(β-heterogeneous stacks, pre-moved to (..., B)).

Replaces mj_fullM / qfrc_bias on the batched hot path (the reference
stable-PD reads these from MjData, smpl_sim/envs/controllers.py:177-190).
"""
from __future__ import annotations

import jax.numpy as jnp

from smplsim_tpu.physics.fk_lanes import _cross


def _lane(x, nd):
    """Add a trailing lane axis to an unbatched (shared) field."""
    return x if x.ndim == nd + 1 else x[..., None]


def _skew(v):
    """(J,3,B) -> (J,3,3,B) cross-product matrices."""
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    o = jnp.zeros(jnp.broadcast_shapes(x.shape), x.dtype)
    x, y, z = (jnp.broadcast_to(a, o.shape) for a in (x, y, z))
    return jnp.stack([
        jnp.stack([o, -z, y], axis=1),
        jnp.stack([z, o, -x], axis=1),
        jnp.stack([-y, x, o], axis=1),
    ], axis=1)


def _motion_cross(a, b):
    """Spatial motion cross for twists (...,6,B), 6-axis second to last."""
    aw, av = a[..., :3, :], a[..., 3:, :]
    bw, bv = b[..., :3, :], b[..., 3:, :]
    return jnp.concatenate(
        [_cross(aw, bw), _cross(aw, bv) + _cross(av, bw)], axis=-2
    )


def _force_cross(a, b):
    """Spatial force cross a x* b: twist a, wrench b, (...,6,B)."""
    aw, av = a[..., :3, :], a[..., 3:, :]
    bn, bf = b[..., :3, :], b[..., 3:, :]
    return jnp.concatenate(
        [_cross(aw, bn) + _cross(av, bf), _cross(aw, bf)], axis=-2
    )


def spatial_inertia_lanes(mass, com, inertia_w):
    """(J,6,6,B) spatial inertias about the origin; mass (J[,B]),
    com (J,3[,B]), inertia_w (J,3,3[,B])."""
    com = _lane(com, 2)
    inertia_w = _lane(inertia_w, 3)
    m = _lane(mass, 1)[:, None, None, :]                   # (J,1,1,B?)
    c = _skew(com)                                         # (J,3,3,B)
    cct = (c[:, :, None, :, :] * c[:, None, :, :, :]).sum(3)
    tl = inertia_w + m * cct
    tr = m * c
    bl = m * jnp.swapaxes(c, 1, 2)
    eye = jnp.eye(3, dtype=com.dtype)[None, :, :, None]
    br = jnp.broadcast_to(m * eye, tr.shape)
    top = jnp.concatenate([tl, tr], axis=2)
    bot = jnp.concatenate([bl, br], axis=2)
    return jnp.concatenate([top, bot], axis=1)             # (J,6,6,B)


def _mask_mm(mask_np, x, dtype):
    """(r,c) static mask @ (c,k,B) -> (r,k,B) as one wide matmul."""
    c, k, B = x.shape
    m = jnp.asarray(mask_np, dtype)
    return (m @ x.reshape(c, k * B)).reshape(m.shape[0], k, B)


def mass_matrix_lanes(S, com, inertia_w, body_mass, armature, masks):
    """(nv,nv,B) joint-space inertia incl. armature (== mj_fullM batched).

    S (nv,6,B); model fields shared or (...,B). Same formula as
    dynamics.mass_matrix: M = anc^T*G + anc*G^T - diag(G) + armature."""
    dtype = S.dtype
    nv, _, B = S.shape
    I_O = spatial_inertia_lanes(body_mass, com, inertia_w)
    I_O = jnp.broadcast_to(I_O, I_O.shape[:3] + (B,))
    J = I_O.shape[0]
    sub = jnp.asarray(masks["subtree_body"], dtype)         # (J,J)
    IC = (sub @ I_O.reshape(J, 36 * B)).reshape(J, 6, 6, B)
    IC_dof = IC[masks["dof_body"]]                          # (nv,6,6,B)
    F = (IC_dof * S[:, None, :, :]).sum(2)                  # (nv,6,B)
    # G[i,j] = S_i . F_j as a 6-term outer-product accumulation (VPU,
    # no minor-dim batched matmul)
    G = sum(S[:, k][:, None, :] * F[:, k][None, :, :] for k in range(6))
    anc = jnp.asarray(masks["dof_prefix"], dtype)[:, :, None]
    M = jnp.swapaxes(anc, 0, 1) * G + anc * jnp.swapaxes(G, 0, 1)
    idx = jnp.arange(nv)
    eye = jnp.eye(nv, dtype=dtype)[:, :, None]
    M = M - eye * G[idx, idx][:, None, :]
    return M + eye * _lane(armature, 1)[:, None, :]


def bias_forces_lanes(S, com, inertia_w, body_mass, gravity, qvel, masks):
    """(nv,B) Coriolis/centrifugal + gravity forces (== qfrc_bias batched)."""
    dtype = S.dtype
    nv, _, B = S.shape
    com = jnp.broadcast_to(_lane(com, 2), com.shape[:1] + (3, B))
    Sq = S * _lane(qvel, 1)[:, None, :]                     # (nv,6,B)
    v_dof = _mask_mm(masks["dof_frame"], Sq, dtype)         # (nv,6,B)
    w = _motion_cross(v_dof, Sq)
    a_body = _mask_mm(masks["body_dof"], w, dtype)          # (J,6,B)
    V = _mask_mm(masks["body_dof"], Sq, dtype)              # (J,6,B)
    I_O = spatial_inertia_lanes(body_mass, com, inertia_w)  # (J,6,6,B)
    IV = (I_O * V[:, None, :, :]).sum(2)
    f = (I_O * a_body[:, None, :, :]).sum(2) + _force_cross(V, IV)
    mg = _lane(body_mass, 1)[:, None, :] * _lane(gravity, 1)[None, :, :]
    mg = jnp.broadcast_to(mg, com.shape)
    f = f - jnp.concatenate([_cross(com, mg), mg], axis=1)
    fC = _mask_mm(masks["dof_subtree_body"], f, dtype)      # (nv,6,B)
    return (S * fC).sum(1)                                  # (nv,B)


def external_forces_lanes(S, com, force, torque, masks):
    """(nv,B) generalized forces from per-body world wrenches (batched
    mj_xfrc equivalent; see dynamics.external_forces)."""
    dtype = S.dtype
    B = S.shape[-1]
    com = jnp.broadcast_to(_lane(com, 2), com.shape[:1] + (3, B))
    force = jnp.broadcast_to(_lane(force, 2), com.shape)
    tau = (jnp.zeros_like(force) if torque is None
           else jnp.broadcast_to(_lane(torque, 2), com.shape))
    w = jnp.concatenate([_cross(com, force) + tau, force], axis=1)  # (J,6,B)
    fC = _mask_mm(masks["dof_subtree_body"], w, dtype)
    return (S * fC).sum(1)
