"""Quaternion / rotation algebra in JAX. Everything is wxyz and batch-agnostic.

TPU-native replacement for the reference's numpy/torch quaternion libraries
(smpl_sim/utils/np_transform_utils.py, smpl_sim/utils/torch_utils.py,
smpl_sim/utils/pytorch3d_transforms.py). One convention everywhere: **wxyz**
(MuJoCo order); converters at the edges. All functions are pure, support
arbitrary leading batch dims, and are jit/vmap/grad-safe (no data-dependent
control flow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Convention converters
# ---------------------------------------------------------------------------


def wxyz_to_xyzw(q: jax.Array) -> jax.Array:
    return q[..., jnp.array([1, 2, 3, 0])]


def xyzw_to_wxyz(q: jax.Array) -> jax.Array:
    return q[..., jnp.array([3, 0, 1, 2])]


# ---------------------------------------------------------------------------
# Basic vector helpers
# ---------------------------------------------------------------------------


def normalize(v: jax.Array, eps: float = 1e-9) -> jax.Array:
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


# ---------------------------------------------------------------------------
# Quaternion algebra (wxyz)
# ---------------------------------------------------------------------------


def quat_identity(shape=(), dtype=jnp.float32) -> jax.Array:
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 0].set(1.0)


def quat_unit(q: jax.Array) -> jax.Array:
    return normalize(q)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


quat_inverse = quat_conjugate  # unit quaternions


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q. Broadcasts leading dims."""
    qw = q[..., :1]
    qv = q[..., 1:]
    # v' = v + 2 qw (qv x v) + 2 qv x (qv x v)
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conjugate(q), v)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    """angle (...,), axis (...,3) -> quat (...,4). axis need not be unit."""
    half = 0.5 * angle[..., None]
    xyz = normalize(axis) * jnp.sin(half)
    w = jnp.cos(half)
    return jnp.concatenate([w, xyz], axis=-1)


def quat_to_angle_axis(q: jax.Array, eps: float = 1e-5):
    """Returns (angle (...,), axis (...,3)); angle normalized to [-pi, pi]."""
    sin_half = jnp.linalg.norm(q[..., 1:], axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, q[..., 0])
    angle = normalize_angle(angle)
    safe = sin_half > eps
    axis = q[..., 1:] / jnp.maximum(sin_half, eps)[..., None]
    default = jnp.zeros_like(axis).at[..., 2].set(1.0)
    axis = jnp.where(safe[..., None], axis, default)
    angle = jnp.where(safe, angle, 0.0)
    return angle, axis


def quat_to_exp_map(q: jax.Array) -> jax.Array:
    angle, axis = quat_to_angle_axis(q)
    return angle[..., None] * axis


def exp_map_to_quat(e: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Axis-angle vector (...,3) -> quat, safe at zero in VALUE and GRADIENT.

    The double-where guard keeps sqrt's argument bounded away from 0 on the
    unselected branch so reverse-mode AD never sees d(sqrt)/dx at 0 (the
    standard JAX safe-norm idiom); pose-fitting differentiates through this
    at exactly-zero joint angles."""
    sq = jnp.sum(e * e, axis=-1, keepdims=True)
    small = sq <= eps * eps
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    half = 0.5 * angle
    # sin(x)/x is smooth; series limit 0.5 at zero angle
    k = jnp.where(small, 0.5, jnp.sin(half) / angle)
    cos_half = jnp.where(small, 1.0, jnp.cos(half))
    return jnp.concatenate([cos_half, e * k], axis=-1)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """(...,4) -> (...,3,3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """(...,3,3) -> (...,4) wxyz, branch-free (Shepperd / max-trace blend)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate solutions, pick the numerically best by largest pivot.
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-18))

    qw = jnp.stack([tw, m21 - m12, m02 - m20, m10 - m01], -1) / (2.0 * safe_sqrt(tw))[..., None]
    qx = jnp.stack([m21 - m12, tx, m01 + m10, m02 + m20], -1) / (2.0 * safe_sqrt(tx))[..., None]
    qy = jnp.stack([m02 - m20, m01 + m10, ty, m12 + m21], -1) / (2.0 * safe_sqrt(ty))[..., None]
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, tz], -1) / (2.0 * safe_sqrt(tz))[..., None]

    t = jnp.stack([tw, tx, ty, tz], axis=-1)
    idx = jnp.argmax(t, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4,4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    return quat_unit(jnp.where(q[..., :1] < 0, -q, q))


# ---------------------------------------------------------------------------
# Euler (intrinsic XYZ — MuJoCo stacked x/y/z hinge convention)
# ---------------------------------------------------------------------------


def euler_xyz_to_matrix(e: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler (...,3) -> (...,3,3): R = Rx(a) @ Ry(b) @ Rz(c)."""
    a, b, c = e[..., 0], e[..., 1], e[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    m = jnp.stack(
        [
            cb * cc, -cb * sc, sb,
            sa * sb * cc + ca * sc, -sa * sb * sc + ca * cc, -sa * cb,
            -ca * sb * cc + sa * sc, ca * sb * sc + sa * cc, ca * cb,
        ],
        axis=-1,
    )
    return m.reshape(e.shape[:-1] + (3, 3))


def euler_xyz_to_quat(e: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler -> quat: q = qx * qy * qz."""
    half = 0.5 * e
    c = jnp.cos(half)
    s = jnp.sin(half)
    cx, cy, cz = c[..., 0], c[..., 1], c[..., 2]
    sx, sy, sz = s[..., 0], s[..., 1], s[..., 2]
    return jnp.stack(
        [
            cx * cy * cz - sx * sy * sz,
            sx * cy * cz + cx * sy * sz,
            cx * sy * cz - sx * cy * sz,
            cx * cy * sz + sx * sy * cz,
        ],
        axis=-1,
    )


def matrix_to_euler_xyz(m: jax.Array) -> jax.Array:
    """(...,3,3) -> intrinsic XYZ euler angles (gimbal-safe clamp)."""
    sb = jnp.clip(m[..., 0, 2], -1.0, 1.0)
    b = jnp.arcsin(sb)
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def quat_to_euler_xyz(q: jax.Array) -> jax.Array:
    return matrix_to_euler_xyz(quat_to_matrix(q))


# ---------------------------------------------------------------------------
# Heading helpers (reference: np_transform_utils.calc_heading*)
# ---------------------------------------------------------------------------

_SMPL_BASE_QUAT = (0.5, 0.5, 0.5, 0.5)  # non-upright SMPL base rotation


def calc_heading(q: jax.Array) -> jax.Array:
    """Yaw of the rotated x-axis; q (...,4) -> (...,)."""
    ref = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 0].set(1.0)
    rot = quat_rotate(q, ref)
    return jnp.arctan2(rot[..., 1], rot[..., 0])


def calc_heading_quat(q: jax.Array) -> jax.Array:
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    return quat_from_angle_axis(heading, axis)


def calc_heading_quat_inv(q: jax.Array) -> jax.Array:
    heading = calc_heading(q)
    axis = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    return quat_from_angle_axis(-heading, axis)


def remove_base_rot(q: jax.Array, humanoid_type: str = "smpl") -> jax.Array:
    """Undo the SMPL rest-pose base rotation (reference np_transform_utils.py:140)."""
    if humanoid_type in ("smpl", "smplh", "smplx"):
        base = jnp.asarray(_SMPL_BASE_QUAT, dtype=q.dtype)
        return quat_mul(q, quat_conjugate(jnp.broadcast_to(base, q.shape)))
    return q


def quat_to_tan_norm(q: jax.Array) -> jax.Array:
    """6D tangent/normal rotation encoding (rotated x and z axes), (...,6)."""
    ref_tan = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 0].set(1.0)
    ref_norm = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    tan = quat_rotate(q, ref_tan)
    norm = quat_rotate(q, ref_norm)
    return jnp.concatenate([tan, norm], axis=-1)


def tan_norm_to_matrix(tn: jax.Array) -> jax.Array:
    """Inverse of quat_to_tan_norm via Gram-Schmidt; (...,6) -> (...,3,3)."""
    tan = normalize(tn[..., 0:3])
    norm = tn[..., 3:6]
    norm = normalize(norm - jnp.sum(norm * tan, axis=-1, keepdims=True) * tan)
    binorm = jnp.cross(norm, tan)
    return jnp.stack([tan, binorm, norm], axis=-1)


def normalize_angle(x: jax.Array) -> jax.Array:
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


# ---------------------------------------------------------------------------
# Interpolation
# ---------------------------------------------------------------------------


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical interpolation, shortest arc, safe at q0 ~= q1."""
    cos_half = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(cos_half < 0, -q1, q1)
    cos_half = jnp.abs(cos_half)
    cos_half = jnp.clip(cos_half, -1.0, 1.0)
    half = jnp.arccos(cos_half)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))
    t = jnp.asarray(t)
    if t.ndim < q0.ndim:
        t = t[..., None]
    big = sin_half > 1e-5
    w0 = jnp.where(big, jnp.sin((1 - t) * half) / jnp.where(big, sin_half, 1.0), 1.0 - t)
    w1 = jnp.where(big, jnp.sin(t * half) / jnp.where(big, sin_half, 1.0), t)
    return quat_unit(w0 * q0 + w1 * q1)


def quat_integrate(q: jax.Array, omega_local: jax.Array, dt) -> jax.Array:
    """Integrate unit quat by body-frame angular velocity over dt (MuJoCo
    free-joint convention: qvel rotational part is in the child frame)."""
    return quat_unit(quat_mul(q, exp_map_to_quat(omega_local * dt)))


def quat_diff_angular_velocity(q0: jax.Array, q1: jax.Array, dt) -> jax.Array:
    """World-frame angular velocity taking q0 to q1 over dt (finite diff)."""
    dq = quat_mul(q1, quat_conjugate(q0))
    return quat_to_exp_map(dq) / dt
