"""Property tests for smplsim_tpu.transforms against scipy.spatial.transform."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as sRot

from smplsim_tpu import transforms as T


def rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q_wxyz):
    # np.array copy: scipy rejects jax's read-only buffers
    return sRot.from_quat(np.array(T.wxyz_to_xyzw(jnp.asarray(q_wxyz))))


def test_quat_mul_matches_scipy():
    a, b = rand_quats(64, 1), rand_quats(64, 2)
    ours = np.asarray(T.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    theirs = T.xyzw_to_wxyz(jnp.asarray((to_scipy(a) * to_scipy(b)).as_quat()))
    # sign ambiguity
    theirs = np.asarray(theirs)
    sign = np.sign(np.sum(ours * theirs, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, sign * theirs, atol=1e-12)


def test_quat_rotate_matches_scipy():
    q = rand_quats(64, 3)
    v = np.random.default_rng(4).normal(size=(64, 3))
    ours = np.asarray(T.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    theirs = to_scipy(q).apply(v)
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_quat_matrix_roundtrip():
    q = rand_quats(128, 5)
    m = T.quat_to_matrix(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(m), to_scipy(q).as_matrix(), atol=1e-12)
    q2 = np.asarray(T.matrix_to_quat(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2, sign * q, atol=1e-9)


def test_euler_xyz_intrinsic():
    rng = np.random.default_rng(6)
    e = rng.uniform(-1.4, 1.4, size=(64, 3))
    ours = np.asarray(T.euler_xyz_to_matrix(jnp.asarray(e)))
    theirs = sRot.from_euler("XYZ", e).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)
    # quat path agrees with matrix path
    qm = np.asarray(T.quat_to_matrix(T.euler_xyz_to_quat(jnp.asarray(e))))
    np.testing.assert_allclose(qm, theirs, atol=1e-12)
    # inverse
    e2 = np.asarray(T.matrix_to_euler_xyz(jnp.asarray(theirs)))
    np.testing.assert_allclose(e2, e, atol=1e-9)


def test_exp_map_roundtrip_and_zero_safety():
    rng = np.random.default_rng(7)
    e = rng.normal(size=(64, 3))
    q = T.exp_map_to_quat(jnp.asarray(e))
    theirs = T.xyzw_to_wxyz(jnp.asarray(sRot.from_rotvec(e).as_quat()))
    np.testing.assert_allclose(np.asarray(q), np.asarray(theirs), atol=1e-12)
    back = np.asarray(T.quat_to_exp_map(q))
    np.testing.assert_allclose(back, e, atol=1e-9)
    # zero rotation must not NaN
    z = T.exp_map_to_quat(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(z), [1, 0, 0, 0], atol=1e-12)


def test_heading_removes_yaw_only():
    q = rand_quats(32, 8)
    h_inv = T.calc_heading_quat_inv(jnp.asarray(q))
    deheaded = T.quat_mul(h_inv, jnp.asarray(q))
    # x-axis of the de-headed rotation has zero yaw
    x = T.quat_rotate(deheaded, jnp.broadcast_to(jnp.array([1.0, 0, 0]), (32, 3)))
    yaw = np.arctan2(np.asarray(x)[:, 1], np.asarray(x)[:, 0])
    np.testing.assert_allclose(yaw, 0.0, atol=1e-9)


def test_slerp_endpoints_and_midpoint():
    q0, q1 = jnp.asarray(rand_quats(16, 9)), jnp.asarray(rand_quats(16, 10))
    np.testing.assert_allclose(np.asarray(T.quat_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-9)
    end = np.asarray(T.quat_slerp(q0, q1, 1.0))
    sign = np.sign(np.sum(end * np.asarray(q1), axis=-1, keepdims=True))
    np.testing.assert_allclose(end, sign * np.asarray(q1), atol=1e-9)
    # slerp with itself is identity at any t
    np.testing.assert_allclose(
        np.asarray(T.quat_slerp(q0, q0, 0.37)), np.asarray(q0), atol=1e-9
    )


def test_tan_norm_roundtrip():
    q = jnp.asarray(rand_quats(32, 11))
    tn = T.quat_to_tan_norm(q)
    m = T.tan_norm_to_matrix(tn)
    np.testing.assert_allclose(np.asarray(m), np.asarray(T.quat_to_matrix(q)), atol=1e-9)


def test_quat_integrate_local_omega():
    q = jnp.asarray(rand_quats(8, 12))
    w = jnp.asarray(np.random.default_rng(13).normal(size=(8, 3)))
    dt = 0.01
    q2 = T.quat_integrate(q, w, dt)
    expect = (to_scipy(np.asarray(q)) * sRot.from_rotvec(np.asarray(w) * dt)).as_quat()
    expect = np.asarray(T.xyzw_to_wxyz(jnp.asarray(expect)))
    sign = np.sign(np.sum(np.asarray(q2) * expect, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2), sign * expect, atol=1e-10)
