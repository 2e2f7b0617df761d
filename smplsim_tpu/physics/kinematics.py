"""Forward kinematics and dof motion subspaces.

TPU-native replacement for mujoco.mj_kinematics + the sensor pipeline
(reference reads body velocities from framelinvel/frameangvel sensors,
smpl_sim/envs/humanoid_env.py:539-544). Single-env functions designed for
vmap; the 24-body chain unrolls at trace time.

qpos layout: [0:3] root pos, [3:7] root quat (wxyz), then intrinsic-XYZ hinge
triples per body. qvel: [0:3] world linear vel of root frame origin, [3:6]
root angular velocity in the ROOT BODY frame (MuJoCo free-joint convention),
then hinge rates.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from smplsim_tpu import transforms as T
from smplsim_tpu.models.spec import RobotModel
from smplsim_tpu.physics.topology import tree_masks


class Kin(NamedTuple):
    xpos: jax.Array    # (J,3) body frame origins, world
    xmat: jax.Array    # (J,3,3) body orientations, world
    S: jax.Array       # (nv,6) dof motion subspaces about the world origin
    com: jax.Array     # (J,3) body COM, world
    inertia_w: jax.Array  # (J,3,3) rotational inertia about COM, world


def fk(model: RobotModel, qpos: jax.Array) -> Kin:
    """FK dispatch: per-env reference chain below; under the engine's env
    vmap the custom_vmap rule reroutes the whole batch to the lanes-last
    formulation (physics/fk_lanes.py) — full lane utilization instead of
    (B,3,3) batched tiny matmuls."""
    body_R_local = T.quat_to_matrix(model.body_quat)
    op = _fk_op_for(tuple(int(p) for p in model.parents))
    out = op(
        qpos,
        jnp.asarray(model.body_pos, qpos.dtype),
        body_R_local.astype(qpos.dtype),
        jnp.asarray(model.body_ipos, qpos.dtype),
        jnp.asarray(model.body_inertia, qpos.dtype),
    )
    return Kin(*out)


def _fk_one(qpos, body_pos, body_R_local, body_ipos, body_inertia, parents):
    J = len(parents)
    dtype = qpos.dtype

    root_R = T.quat_to_matrix(qpos[3:7])
    hinge = qpos[7:].reshape(J - 1, 3)
    ca, sa = jnp.cos(hinge), jnp.sin(hinge)

    xpos = [qpos[0:3]]
    xmat = [root_R]
    # per-body dof axes in world (3 per non-root body)
    axes = []

    for b in range(1, J):
        p = parents[b]
        Rp = xmat[p]
        pos = xpos[p] + Rp @ body_pos[b]
        F0 = Rp @ body_R_local[b]  # frame before the hinge stack
        i = b - 1
        cx, cy, cz = ca[i, 0], ca[i, 1], ca[i, 2]
        sx, sy, sz = sa[i, 0], sa[i, 1], sa[i, 2]
        # R_local = Rx @ Ry @ Rz (intrinsic XYZ), constructed explicitly
        Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], dtype=dtype)
        Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], dtype=dtype)
        Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], dtype=dtype)
        F1 = F0 @ Rx
        F2 = F1 @ Ry
        R = F2 @ Rz
        xpos.append(pos)
        xmat.append(R)
        # world hinge axes: x of F0, y of F1, z of F2
        axes.append(jnp.stack([F0[:, 0], F1[:, 1], F2[:, 2]]))

    xpos = jnp.stack(xpos)  # (J,3)
    xmat = jnp.stack(xmat)  # (J,3,3)

    # ---- dof motion subspaces about world origin: S = [axis; anchor x axis]
    # root translation: [0; e_k]
    S_trans = jnp.concatenate(
        [jnp.zeros((3, 3), dtype), jnp.eye(3, dtype=dtype)], axis=1
    )
    # root rotation: axes are root-body-frame axes (MuJoCo local angvel),
    # anchored at the root frame origin
    p0 = qpos[0:3]
    rot_axes = root_R.T  # row k = world direction of root body axis k
    S_rot = jnp.concatenate(
        [rot_axes, jnp.cross(jnp.broadcast_to(p0, (3, 3)), rot_axes)], axis=1
    )

    hinge_axes = jnp.concatenate(axes, axis=0) if axes else jnp.zeros((0, 3), dtype)  # (3(J-1),3)
    anchors = jnp.repeat(xpos[1:], 3, axis=0)  # (3(J-1),3)
    S_hinge = jnp.concatenate([hinge_axes, jnp.cross(anchors, hinge_axes)], axis=1)

    S = jnp.concatenate([S_trans, S_rot, S_hinge], axis=0)  # (nv,6)

    com = xpos + jnp.einsum("bij,bj->bi", xmat, body_ipos)
    inertia_w = jnp.einsum(
        "bij,bjk,blk->bil", xmat, body_inertia, xmat
    )
    return xpos, xmat, S, com, inertia_w


@functools.lru_cache(maxsize=8)
def _fk_op_for(parents: tuple):
    """Build the (custom_jvp ∘ custom_vmap) FK op for a topology. Cached per
    parents tuple so repeated fk() calls reuse one op (and one trace)."""

    @jax.custom_batching.custom_vmap
    def _fk_core(qpos, body_pos, body_R_local, body_ipos, body_inertia):
        return _fk_one(
            qpos, body_pos, body_R_local, body_ipos, body_inertia, parents
        )

    @_fk_core.def_vmap
    def _fk_core_vmap(axis_size, in_batched,
                      qpos, body_pos, body_R_local, body_ipos, body_inertia):
        from smplsim_tpu.physics import fk_lanes

        def prep(x, batched):
            # batched leading axis -> lanes-last; shared fields stay as-is
            return jnp.moveaxis(x, 0, -1) if batched else x

        if not in_batched[0]:
            qpos = jnp.broadcast_to(qpos, (axis_size,) + qpos.shape)
            in_batched = (True,) + tuple(in_batched[1:])
        args = [prep(x, b) for x, b in zip(
            (qpos, body_pos, body_R_local, body_ipos, body_inertia),
            in_batched,
        )]
        outs = fk_lanes.fk_lanes(*args, parents)
        outs = tuple(jnp.moveaxis(o, -1, 0) for o in outs)
        return outs, (True,) * 5

    @jax.custom_jvp
    def _fk_op(qpos, body_pos, body_R_local, body_ipos, body_inertia):
        return _fk_core(qpos, body_pos, body_R_local, body_ipos, body_inertia)

    @_fk_op.defjvp
    def _fk_jvp(primals, tangents):
        # differentiate the reference path (plain ops) — iLQR jacfwds
        return jax.jvp(
            lambda *a: _fk_one(*a, parents), primals, tangents
        )

    return _fk_op


def body_quats(model: RobotModel, qpos: jax.Array) -> jax.Array:
    """(J,4) world body quaternions (obs path; not needed per substep)."""
    J = model.nbody
    hinge = qpos[7:].reshape(J - 1, 3)
    local = T.quat_mul(
        jnp.concatenate([qpos[None, 3:7], model.body_quat[1:]], axis=0),
        jnp.concatenate(
            [T.quat_identity((1,)).astype(qpos.dtype), T.euler_xyz_to_quat(hinge)], axis=0
        ),
    )
    out = [local[0]]
    for b in range(1, J):
        out.append(T.quat_mul(out[model.parents[b]], local[b]))
    return jnp.stack(out)


def body_twists(model: RobotModel, kin: Kin, qvel: jax.Array) -> jax.Array:
    """(J,6) body twists [omega; v_O] about the world origin."""
    masks = tree_masks(model.parents)
    A = jnp.asarray(masks["body_dof"], dtype=qvel.dtype)
    return A @ (kin.S * qvel[:, None])


def body_velocities(model: RobotModel, kin: Kin, qvel: jax.Array):
    """World linear velocity of each body frame origin + angular velocity.

    Matches MuJoCo framelinvel/frameangvel sensors (objtype=xbody).
    Returns (linvel (J,3), angvel (J,3)).
    """
    V = body_twists(model, kin, qvel)
    w, v0 = V[:, :3], V[:, 3:]
    lin = v0 + jnp.cross(w, kin.xpos)
    return lin, w
