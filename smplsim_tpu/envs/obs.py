"""Proprioceptive observations, exact ports of the reference obs functions
(smpl_sim/envs/humanoid_env.py:565-688, itself a replica of PHC's).

All heading-invariant: positions/rotations/velocities are expressed in the
frame obtained by removing the root yaw (and the SMPL base rotation when the
model was not built upright).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from smplsim_tpu import transforms as T


def compute_self_obs_v1(
    qvel: jax.Array,
    body_pos: jax.Array,   # (J,3)
    body_rot: jax.Array,   # (J,4) wxyz
    upright_start: bool,
    root_height_obs: bool,
    humanoid_type: str = "smpl",
) -> jax.Array:
    """Obs v1: root_h + local body pos + 6D rots + local root vels + dof vel."""
    J = body_pos.shape[0]
    root_pos = body_pos[0]
    root_rot = body_rot[0]
    if not upright_start:
        root_rot = T.remove_base_rot(root_rot, humanoid_type)
    heading_inv = T.calc_heading_quat_inv(root_rot)

    parts = []
    if root_height_obs:
        parts.append(root_pos[2:3])

    h = jnp.broadcast_to(heading_inv, (J, 4))
    local_body_pos = T.quat_rotate(h, body_pos - root_pos)  # (J,3)
    parts.append(local_body_pos[1:].reshape(-1))

    local_body_rot = T.quat_mul(h, body_rot)
    parts.append(T.quat_to_tan_norm(local_body_rot).reshape(-1))

    parts.append(T.quat_rotate(heading_inv, qvel[0:3]))
    parts.append(T.quat_rotate(heading_inv, qvel[3:6]))
    parts.append(qvel[6:])
    return jnp.concatenate(parts)


def compute_self_obs_v2(
    body_pos: jax.Array,      # (J,3)
    body_rot: jax.Array,      # (J,4)
    body_vel: jax.Array,      # (J,3) world linear velocity (sensor equivalent)
    body_ang_vel: jax.Array,  # (J,3) world angular velocity
    upright_start: bool,
    root_height_obs: bool,
    humanoid_type: str = "smpl",
) -> jax.Array:
    """Obs v2 (PHC replica): per-body local pos/rot/linvel/angvel."""
    J = body_pos.shape[0]
    root_pos = body_pos[0]
    root_rot = body_rot[0]
    if not upright_start:
        root_rot = T.remove_base_rot(root_rot, humanoid_type)
    heading_inv = T.calc_heading_quat_inv(root_rot)
    h = jnp.broadcast_to(heading_inv, (J, 4))

    parts = []
    if root_height_obs:
        parts.append(root_pos[2:3])
    parts.append(T.quat_rotate(h, body_pos - root_pos)[1:].reshape(-1))
    parts.append(T.quat_to_tan_norm(T.quat_mul(h, body_rot)).reshape(-1))
    parts.append(T.quat_rotate(h, body_vel).reshape(-1))
    parts.append(T.quat_rotate(h, body_ang_vel).reshape(-1))
    return jnp.concatenate(parts)


def self_obs_size(nbody: int, self_obs_v: int, root_height_obs: bool, has_shape_obs: bool = False) -> int:
    """Matches reference setup_humanoid_properties (humanoid_env.py:292-305)."""
    n = 1 if root_height_obs else 0
    if self_obs_v == 1:
        n += (nbody - 1) * 3 + nbody * 6 + 3 + 3 + (nbody - 1) * 3
    elif self_obs_v == 2:
        n += (nbody - 1) * 3 + nbody * (6 + 3 + 3)
    else:
        raise NotImplementedError(f"self_obs_v {self_obs_v}")
    if has_shape_obs:
        n += 10
    return n
