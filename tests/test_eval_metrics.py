"""Eval metrics vs the reference numpy implementations (smpl_eval.py)."""
import numpy as np
import jax.numpy as jnp

from smplsim_tpu.eval import (
    compute_error_accel,
    compute_error_vel,
    compute_metrics_lite,
    compute_penetration,
    compute_skate,
    p_mpjpe,
)


def ref_p_mpjpe(predicted, target):
    """Verbatim reference math (smpl_eval.py:98-137)."""
    muX = np.mean(target, axis=1, keepdims=True)
    muY = np.mean(predicted, axis=1, keepdims=True)
    X0 = target - muX
    Y0 = predicted - muY
    normX = np.sqrt(np.sum(X0**2, axis=(1, 2), keepdims=True))
    normY = np.sqrt(np.sum(Y0**2, axis=(1, 2), keepdims=True))
    X0 /= normX
    Y0 /= normY
    H = np.matmul(X0.transpose(0, 2, 1), Y0)
    U, s, Vt = np.linalg.svd(H)
    V = Vt.transpose(0, 2, 1)
    R = np.matmul(V, U.transpose(0, 2, 1))
    sign_detR = np.sign(np.expand_dims(np.linalg.det(R), axis=1))
    V[:, :, -1] *= sign_detR
    s[:, -1] *= sign_detR.flatten()
    R = np.matmul(V, U.transpose(0, 2, 1))
    tr = np.expand_dims(np.sum(s, axis=1, keepdims=True), axis=2)
    a = tr * normX / normY
    t = muX - a * np.matmul(muY, R)
    predicted_aligned = a * np.matmul(predicted, R) + t
    return np.linalg.norm(predicted_aligned - target, axis=-1)


def test_p_mpjpe_matches_reference():
    rng = np.random.RandomState(0)
    gt = rng.randn(12, 24, 3)
    pred = gt + 0.05 * rng.randn(12, 24, 3)
    ours = np.asarray(p_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
    ref = ref_p_mpjpe(pred, gt)
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_vel_accel_errors():
    rng = np.random.RandomState(1)
    gt = rng.randn(20, 24, 3)
    pred = gt + 0.01 * rng.randn(20, 24, 3)
    vg = gt[1:] - gt[:-1]
    vp = pred[1:] - pred[:-1]
    ref_vel = np.mean(np.linalg.norm(vp - vg, axis=2), axis=1)
    np.testing.assert_allclose(
        np.asarray(compute_error_vel(jnp.asarray(gt), jnp.asarray(pred))),
        ref_vel, atol=1e-10,
    )
    ag = gt[:-2] - 2 * gt[1:-1] + gt[2:]
    ap = pred[:-2] - 2 * pred[1:-1] + pred[2:]
    ref_acc = np.mean(np.linalg.norm(ap - ag, axis=2), axis=1)
    np.testing.assert_allclose(
        np.asarray(compute_error_accel(jnp.asarray(gt), jnp.asarray(pred))),
        ref_acc, atol=1e-10,
    )


def test_penetration_and_skate():
    verts = np.zeros((3, 4, 3))
    verts[0, 0, 2] = -0.01   # 10 mm below floor
    verts[1, 0, 2] = -0.02
    verts[1, 0, 0] = 0.003   # slipped 3 mm while grounded
    pen = np.asarray(compute_penetration(jnp.asarray(verts)))
    np.testing.assert_allclose(pen, [10.0, 20.0, 0.0], atol=1e-6)
    # all 4 verts grounded (z <= 0) across t=0..1; one slipped 3 mm
    skate = np.asarray(compute_skate(jnp.asarray(verts)))
    assert abs(skate[0] - 3.0 / 4.0) < 1e-6


def test_metrics_lite_keys_and_ttr():
    rng = np.random.RandomState(2)
    gt = rng.randn(10, 24, 3)
    m = compute_metrics_lite(jnp.asarray(gt + 0.01), jnp.asarray(gt))
    assert set(m) == {"mpjpe_g", "mpjpe_l", "mpjpe_pa", "vel_dist", "accel_dist", "ttr"}
    # 10*sqrt(3) mm global error -> well under the 120 mm TTR threshold
    assert bool(np.all(np.asarray(m["ttr"])))
