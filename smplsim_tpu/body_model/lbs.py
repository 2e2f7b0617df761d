"""Linear blend skinning for SMPL-family body models, in JAX.

TPU-native replacement for the smplx package's torch LBS the reference
delegates to (smpl_sim/smpllib/smpl_parser.py:127-152 wraps
smplx.SMPL.forward). Standard SMPL math:

    v_shaped = v_template + shapedirs . betas
    J = J_regressor @ v_shaped
    v_posed  = v_shaped + posedirs . (R(theta) - I)        [pose blendshapes]
    verts    = sum_k W[:,k] * (G_k(theta, J) @ v_posed)    [skinning]

Reference paper: Loper et al., "SMPL: A Skinned Multi-Person Linear Model".
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from smplsim_tpu import transforms as T


def blend_shapes(betas: jax.Array, shape_disps: jax.Array) -> jax.Array:
    """(B, num_betas) x (V,3,num_betas) -> (B,V,3)."""
    return jnp.einsum("bl,vdl->bvd", betas, shape_disps)


def vertices2joints(J_regressor: jax.Array, vertices: jax.Array) -> jax.Array:
    """(J,V) x (B,V,3) -> (B,J,3)."""
    return jnp.einsum("jv,bvd->bjd", J_regressor, vertices)


def batch_rigid_transform(
    rot_mats: jax.Array,   # (B,J,3,3) local joint rotations
    joints: jax.Array,     # (B,J,3) rest-pose joint positions
    parents,               # (J,) parent indices, parents[0] == -1
):
    """Returns (posed_joints (B,J,3), rel_transforms (B,J,4,4))."""
    B, J = joints.shape[:2]
    dtype = joints.dtype
    rel = joints.at[:, 1:].add(-joints[:, list(parents[1:])])  # local offsets

    def make_T(R, t):
        Tm = jnp.zeros(R.shape[:-2] + (4, 4), dtype)
        Tm = Tm.at[..., :3, :3].set(R)
        Tm = Tm.at[..., :3, 3].set(t)
        return Tm.at[..., 3, 3].set(1.0)

    local = make_T(rot_mats, rel)  # (B,J,4,4)
    chains = [local[:, 0]]
    for j in range(1, J):
        chains.append(chains[parents[j]] @ local[:, j])
    G = jnp.stack(chains, axis=1)                      # (B,J,4,4)
    posed_joints = G[..., :3, 3]
    # subtract the rest-pose joint location transformed by G (skinning wants
    # displacements relative to the rest pose)
    joints_h = jnp.concatenate([joints, jnp.zeros((B, J, 1), dtype)], -1)
    correction = jnp.einsum("bjik,bjk->bji", G, joints_h)
    rel_G = G.at[..., :3, 3].add(-correction[..., :3])
    return posed_joints, rel_G


def lbs(
    betas: jax.Array,        # (B, num_betas)
    pose_aa: jax.Array,      # (B, J*3) axis-angle incl. global orient
    v_template: jax.Array,   # (V,3)
    shapedirs: jax.Array,    # (V,3,num_betas)
    posedirs: jax.Array | None,   # ((J-1)*9, V*3) or None to skip
    J_regressor: jax.Array,  # (J,V)
    parents,                 # (J,)
    lbs_weights: jax.Array,  # (V,J)
):
    """Returns (vertices (B,V,3), joints (B,J,3))."""
    B = betas.shape[0]
    J = len(parents)
    dtype = betas.dtype

    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    joints = vertices2joints(J_regressor, v_shaped)

    rot = T.quat_to_matrix(T.exp_map_to_quat(pose_aa.reshape(B, J, 3)))
    if posedirs is not None:
        ident = jnp.eye(3, dtype=dtype)
        pose_feature = (rot[:, 1:] - ident).reshape(B, -1)   # (B,(J-1)*9)
        v_posed = v_shaped + jnp.einsum(
            "bp,pv->bv", pose_feature, posedirs
        ).reshape(B, -1, 3)
    else:
        v_posed = v_shaped

    posed_joints, G = batch_rigid_transform(rot, joints, parents)

    W = lbs_weights  # (V,J)
    T_skin = jnp.einsum("vj,bjik->bvik", W, G)          # (B,V,4,4)
    v_h = jnp.concatenate(
        [v_posed, jnp.ones(v_posed.shape[:-1] + (1,), dtype)], axis=-1
    )
    verts = jnp.einsum("bvik,bvk->bvi", T_skin, v_h)[..., :3]
    return verts, posed_joints
