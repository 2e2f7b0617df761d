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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from smplsim_tpu.models.spec import RobotModel
from smplsim_tpu.physics import linalg
from smplsim_tpu.physics import algebra
from smplsim_tpu.physics.kinematics import Kin
from smplsim_tpu.physics.topology import tree_masks


def spatial_inertias(model: RobotModel, kin: Kin) -> jax.Array:
    """(J,6,6) per-body spatial inertia about the world origin."""
    return algebra.spatial_inertia(model.body_mass, kin.com, kin.inertia_w)


def mass_matrix(model: RobotModel, kin: Kin) -> jax.Array:
    """(nv,nv) joint-space inertia matrix incl. armature (== mj_fullM).

    Dispatch: per-env reference formula in `_mass_one`; under the engine's
    env vmap the custom_vmap rule reroutes the batch to the lanes-last
    formulation (physics/dynamics_lanes.py)."""
    op = _dyn_op_for(model.parents, "mass")
    return op(kin.S, kin.com, kin.inertia_w, model.body_mass, model.armature)


def _mass_one(S, com, inertia_w, body_mass, armature, masks):
    dtype = S.dtype
    I_O = algebra.spatial_inertia(body_mass, com, inertia_w)  # (J,6,6)
    sub = jnp.asarray(masks["subtree_body"], dtype)
    # composite inertia of each body's subtree
    IC = jnp.einsum("bd,dij->bij", sub, I_O)  # (J,6,6)
    IC_dof = IC[masks["dof_body"]]  # (nv,6,6) static gather
    F = jnp.einsum("vij,vj->vi", IC_dof, S)  # (nv,6)
    G = S @ F.T  # (nv,nv): G_ij = S_i . IC_{b(j)} S_j
    anc = jnp.asarray(masks["dof_prefix"], dtype)  # anc[i,j]=1 iff j<=i
    M = anc.T * G + anc * G.T - jnp.diag(jnp.diag(G))
    return M + jnp.diag(armature)


def bias_forces(model: RobotModel, kin: Kin, qvel: jax.Array) -> jax.Array:
    """(nv,) Coriolis/centrifugal + gravity generalized forces (== qfrc_bias).

    Same custom_vmap dispatch as mass_matrix (lanes path:
    dynamics_lanes.bias_forces_lanes)."""
    op = _dyn_op_for(model.parents, "bias")
    return op(kin.S, kin.com, kin.inertia_w, model.body_mass,
              model.gravity, qvel)


def _bias_one(S, com, inertia_w, body_mass, gravity, qvel, masks):
    dtype = S.dtype
    mk = {k: (jnp.asarray(v, dtype) if k != "dof_body" else v)
          for k, v in masks.items()}
    Sq = S * qvel[:, None]  # (nv,6)
    # twist of the frame each dof's axis rides on
    v_dof = mk["dof_frame"] @ Sq  # (nv,6)
    w = algebra.motion_cross(v_dof, Sq)  # (nv,6) velocity-product terms
    a_body = mk["body_dof"] @ w  # (J,6) bias accelerations
    V = mk["body_dof"] @ Sq  # (J,6) body twists

    I_O = algebra.spatial_inertia(body_mass, com, inertia_w)
    IV = jnp.einsum("bij,bj->bi", I_O, V)
    f = jnp.einsum("bij,bj->bi", I_O, a_body) + algebra.force_cross(V, IV)
    # gravity as an external wrench about the origin: [c x mg; mg]
    mg = body_mass[:, None] * gravity[None, :]
    f = f - jnp.concatenate([jnp.cross(com, mg), mg], axis=1)
    # project onto dofs: each dof sees the summed wrench of its subtree
    fC = jnp.einsum("vb,bi->vi", mk["dof_subtree_body"], f)  # (nv,6)
    return jnp.sum(S * fC, axis=1)


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
    op = _dyn_op_for(model.parents, "ext")
    tau = jnp.zeros_like(force) if torque is None else torque
    return op(kin.S, kin.com, force, tau)


def _ext_one(S, com, force, tau, masks):
    dtype = S.dtype
    # wrench about the origin: [c x f + tau; f]
    w = jnp.concatenate([jnp.cross(com, force) + tau, force], axis=1)  # (J,6)
    sub = jnp.asarray(masks["dof_subtree_body"], dtype)
    fC = jnp.einsum("vb,bi->vi", sub, w)  # (nv,6)
    return jnp.sum(S * fC, axis=1)


@functools.lru_cache(maxsize=24)
def _dyn_op_for(parents: tuple, which: str):
    """Build the (custom_jvp ∘ custom_vmap) dynamics op for a topology.

    Same dispatch pattern as kinematics._fk_op_for: per-env calls (and all
    differentiation — MPC jacfwds) run the plain reference formula; under an
    env vmap the whole batch runs the lanes-last twin in dynamics_lanes.
    Model fields may be shared or per-env (β-heterogeneous stacks)."""
    from smplsim_tpu.physics import dynamics_lanes as DL

    masks = tree_masks(parents)
    one = {
        "mass": lambda *a: _mass_one(*a, masks),
        "bias": lambda *a: _bias_one(*a, masks),
        "ext": lambda *a: _ext_one(*a, masks),
    }[which]
    lanes = {
        "mass": lambda *a: DL.mass_matrix_lanes(*a, masks),
        "bias": lambda *a: DL.bias_forces_lanes(*a, masks),
        "ext": lambda *a: DL.external_forces_lanes(*a, masks),
    }[which]

    @jax.custom_batching.custom_vmap
    def _core(*args):
        return one(*args)

    @_core.def_vmap
    def _core_vmap(axis_size, in_batched, *args):
        # S (arg 0) anchors the lane width; broadcast it if unbatched
        args = list(args)
        if not in_batched[0]:
            args[0] = jnp.broadcast_to(
                args[0], (axis_size,) + args[0].shape)
            in_batched = (True,) + tuple(in_batched[1:])
        prepped = [
            jnp.moveaxis(x, 0, -1) if b else x
            for x, b in zip(args, in_batched)
        ]
        out = lanes(*prepped)
        return jnp.moveaxis(out, -1, 0), True

    @jax.custom_jvp
    def _op(*args):
        return _core(*args)

    @_op.defjvp
    def _op_jvp(primals, tangents):
        # differentiate the reference path (plain ops)
        return jax.jvp(one, primals, tangents)

    return _op


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
    chol, qacc = linalg.cho_factor_solve(M, qfrc)
    return Smooth(M=M, chol=chol, qfrc_smooth=qfrc, qacc_smooth=qacc)
