"""Mass matrix, bias forces, and smooth forward dynamics.

TPU-native replacement for MuJoCo's CRBA/RNEA (mj_fullM / qfrc_bias, used by
the reference stable-PD controller, smpl_sim/envs/controllers.py:177-190).
Everything is expressed about the world origin (see physics/algebra.py) so
assembly is dense masked matmuls instead of sequential 6x6 transforms:

  M = anc^T * G + anc * G^T - diag(G)   with  G_ij = S_i . (IC_{b(j)} S_j)
  C_i = S_i . sum_{b in subtree(i)} [ I_b a_b + v_b x* (I_b v_b) - f_grav,b ]

where IC are composite spatial inertias and a_b the velocity-product
accelerations. This matches mujoco's qM/qfrc_bias exactly (see
tests/test_dynamics_parity.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smplsim_tpu.models.spec import RobotModel
from smplsim_tpu.physics import linalg
from smplsim_tpu.physics import algebra
from smplsim_tpu.physics.kinematics import Kin
from smplsim_tpu.physics.topology import tree_masks


def _masks(model: RobotModel, dtype):
    m = tree_masks(model.parents)
    return {k: (jnp.asarray(v, dtype=dtype) if k != "dof_body" else v) for k, v in m.items()}


def spatial_inertias(model: RobotModel, kin: Kin) -> jax.Array:
    """(J,6,6) per-body spatial inertia about the world origin."""
    return algebra.spatial_inertia(model.body_mass, kin.com, kin.inertia_w)


def mass_matrix(model: RobotModel, kin: Kin) -> jax.Array:
    """(nv,nv) joint-space inertia matrix incl. armature (== mj_fullM)."""
    dtype = kin.S.dtype
    masks = _masks(model, dtype)
    I_O = spatial_inertias(model, kin)  # (J,6,6)
    # composite inertia of each body's subtree
    IC = jnp.einsum("bd,dij->bij", masks["subtree_body"], I_O)  # (J,6,6)
    IC_dof = IC[masks["dof_body"]]  # (nv,6,6) static gather
    F = jnp.einsum("vij,vj->vi", IC_dof, kin.S)  # (nv,6)
    G = kin.S @ F.T  # (nv,nv): G_ij = S_i . IC_{b(j)} S_j
    anc = masks["dof_prefix"]  # anc[i,j]=1 iff j at-or-before i
    M = anc.T * G + anc * G.T - jnp.diag(jnp.diag(G))
    return M + jnp.diag(model.armature)


def bias_forces(model: RobotModel, kin: Kin, qvel: jax.Array) -> jax.Array:
    """(nv,) Coriolis/centrifugal + gravity generalized forces (== qfrc_bias)."""
    dtype = kin.S.dtype
    masks = _masks(model, dtype)
    Sq = kin.S * qvel[:, None]  # (nv,6)
    # twist of the frame each dof's axis rides on
    v_dof = masks["dof_frame"] @ Sq  # (nv,6)
    w = algebra.motion_cross(v_dof, Sq)  # (nv,6) velocity-product terms
    a_body = masks["body_dof"] @ w  # (J,6) bias accelerations
    V = masks["body_dof"] @ Sq  # (J,6) body twists

    I_O = spatial_inertias(model, kin)
    IV = jnp.einsum("bij,bj->bi", I_O, V)
    f = jnp.einsum("bij,bj->bi", I_O, a_body) + algebra.force_cross(V, IV)
    # gravity as an external wrench about the origin: [c x mg; mg]
    mg = model.body_mass[:, None] * model.gravity[None, :]
    f = f - jnp.concatenate([jnp.cross(kin.com, mg), mg], axis=1)
    # project onto dofs: each dof sees the summed wrench of its subtree
    fC = jnp.einsum("vb,bi->vi", masks["dof_subtree_body"], f)  # (nv,6)
    return jnp.sum(kin.S * fC, axis=1)


def passive_forces(model: RobotModel, qvel: jax.Array) -> jax.Array:
    """(nv,) passive joint forces (damping; springs unused by SMPL models)."""
    return -model.dof_damping * qvel


def external_forces(
    model: RobotModel, kin: Kin, force: jax.Array, torque: jax.Array | None = None
) -> jax.Array:
    """(nv,) generalized forces from per-body external wrenches (mj_xfrc
    equivalent — the TPU-native impulse/projectile perturbation hook,
    reference nv/humanoid.py:80-190 throws projectile assets instead).

    force (J,3): world-frame force applied at each body's COM;
    torque (J,3): optional world-frame torque. Converted to wrenches about
    the world origin and projected onto each ancestor dof via the same
    masked-matmul machinery as bias_forces.
    """
    dtype = kin.S.dtype
    masks = _masks(model, dtype)
    tau = jnp.zeros_like(force) if torque is None else torque
    # wrench about the origin: [c x f + tau; f]
    w = jnp.concatenate([jnp.cross(kin.com, force) + tau, force], axis=1)  # (J,6)
    fC = jnp.einsum("vb,bi->vi", masks["dof_subtree_body"], w)  # (nv,6)
    return jnp.sum(kin.S * fC, axis=1)


def actuator_forces(model: RobotModel, ctrl: jax.Array) -> jax.Array:
    """(nv,) generalized forces from motor actuators (gear * ctrl per hinge)."""
    return jnp.concatenate([jnp.zeros(6, dtype=ctrl.dtype), model.gear * ctrl])


class Smooth(NamedTuple):
    M: jax.Array          # (nv,nv)
    chol: jax.Array       # (nv,nv) lower Cholesky factor of M
    qfrc_smooth: jax.Array  # (nv,) total smooth force
    qacc_smooth: jax.Array  # (nv,) unconstrained acceleration


def smooth_dynamics(
    model: RobotModel, kin: Kin, qvel: jax.Array, ctrl: jax.Array
) -> Smooth:
    M = mass_matrix(model, kin)
    qfrc = (
        actuator_forces(model, ctrl)
        + passive_forces(model, qvel)
        - bias_forces(model, kin, qvel)
    )
    chol = linalg.cholesky(M)
    qacc = linalg.cho_solve(chol, qfrc)
    return Smooth(M=M, chol=chol, qfrc_smooth=qfrc, qacc_smooth=qacc)
