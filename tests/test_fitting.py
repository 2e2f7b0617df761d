"""Pose fitting: reprojection losses are differentiable and recover a
perturbed pose (reference np_smpl_humanoid_batch.py autograd fitter)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smplsim_tpu.models import registry
from smplsim_tpu.motion.fitting import (
    CameraParams,
    PoseFitter,
    normalize_screen_coordinates,
    smpl_op_to_op,
)
from smplsim_tpu.motion.fk import HumanoidBatchFK


@pytest.fixture(scope="module")
def fitter():
    model = registry.default_humanoid(dtype=jnp.float64)
    fk = HumanoidBatchFK.from_robot_model(model, filter_vel=False)
    cam = CameraParams(
        full_R=np.eye(3),
        full_t=np.array([0.0, -1.0, 3.0]),   # camera 3m in front
        K=np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1.0]]),
    )
    return PoseFitter(fk, cam)


def _vec(rng, fk, Tn=2, scale=0.0):
    J = fk.num_joints
    v = np.zeros((Tn, 1, 3 + J * 3))
    v[..., 2] = 0.95
    v[..., 3:] += rng.normal(size=(Tn, 1, J * 3)) * scale
    return jnp.asarray(v)


def test_normalize_screen_coords():
    out = np.asarray(normalize_screen_coordinates(
        jnp.asarray([[0.0, 0.0], [1920.0, 1080.0]]), 1920, 1080
    ))
    np.testing.assert_allclose(out[0], [-1.0, -1080 / 1920])
    np.testing.assert_allclose(out[1], [1.0, 1080 / 1920])


def test_smpl_op_to_op_shape():
    x = jnp.arange(14 * 2, dtype=jnp.float64).reshape(1, 14, 2)
    out = smpl_op_to_op(x)
    assert out.shape == (1, 12, 2)
    np.testing.assert_allclose(
        np.asarray(out[0, 0]), np.asarray(x[0, [1, 4]].mean(axis=0))
    )


def test_proj2d_finite(fitter):
    rng = np.random.default_rng(0)
    vec = _vec(rng, fitter.fk)
    p2 = np.asarray(fitter.proj2d(fitter.fk_from_vec(vec)))
    assert p2.shape[0] == 2 and p2.shape[-1] == 2
    assert np.isfinite(p2).all()


def test_fit_recovers_perturbed_pose(fitter):
    rng = np.random.default_rng(1)
    true_vec = _vec(rng, fitter.fk, scale=0.1)
    gt2d = fitter.proj2d(fitter.fk_from_vec(true_vec))
    fitter.set_targets(gt2d)

    init = true_vec + jnp.asarray(
        rng.normal(size=np.asarray(true_vec).shape) * 0.05
    )
    loss0 = float(fitter.proj_2d_loss(init))
    fitted, losses = fitter.fit(init, steps=100, lr=0.01)
    loss1 = float(fitter.proj_2d_loss(fitted))
    assert np.isfinite(np.asarray(losses)).all()
    assert loss1 < loss0 * 0.2, (loss0, loss1)


def test_line_and_root_losses_differentiable(fitter):
    rng = np.random.default_rng(2)
    vec = _vec(rng, fitter.fk, scale=0.05)
    gt2d = fitter.proj2d(fitter.fk_from_vec(vec))
    fitter.set_targets(gt2d)
    g = jax.grad(fitter.proj_2d_line_loss)(vec)
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(fitter.proj_2d_body_loss)(vec)
    assert np.isfinite(np.asarray(g2)).all()
    root = jnp.zeros(6).at[2].set(0.9)
    g3 = jax.grad(fitter.proj_2d_root_loss)(root)
    assert np.isfinite(np.asarray(g3)).all()
