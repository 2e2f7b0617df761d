"""Lanes-last mass-matrix / bias-force / external-force twins must match the
per-env reference formulas (same origin-frame algebra, transposed layout;
physics/dynamics_lanes.py). Every vmapped (training/batched) env runs these
via custom_vmap dispatch in physics/dynamics.py, so divergence would
silently change batched physics while the unbatched parity suite stays
green."""
import numpy as np

import jax
import jax.numpy as jnp

from smplsim_tpu.models import mjcf, stack_models
from smplsim_tpu.physics import dynamics, kinematics
from tests.conftest import REFERENCE_XML


def _model(dtype=jnp.float64):
    with open(REFERENCE_XML) as f:
        return mjcf.parse_mjcf(f.read(), dtype=dtype)


def _random_states(model, B, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, model.nq))
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    return jnp.asarray(q), jnp.asarray(rng.normal(size=(B, model.nv)))


def test_vmap_matches_per_env():
    model = _model()
    B = 8
    qpos, qvel = _random_states(model, B)
    rng = np.random.default_rng(1)
    force = jnp.asarray(rng.normal(size=(B, model.nbody, 3)))

    kins = [kinematics.fk(model, q) for q in qpos]
    M_r = jnp.stack([dynamics.mass_matrix(model, k) for k in kins])
    C_r = jnp.stack(
        [dynamics.bias_forces(model, k, v) for k, v in zip(kins, qvel)]
    )
    E_r = jnp.stack(
        [dynamics.external_forces(model, k, f) for k, f in zip(kins, force)]
    )

    def batched(q, v, f):
        k = kinematics.fk(model, q)
        return (
            dynamics.mass_matrix(model, k),
            dynamics.bias_forces(model, k, v),
            dynamics.external_forces(model, k, f),
        )

    M_b, C_b, E_b = jax.vmap(batched)(qpos, qvel, force)
    for name, r, b in (("M", M_r, M_b), ("C", C_r, C_b), ("ext", E_r, E_b)):
        scale = float(jnp.max(jnp.abs(r)))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(r), atol=1e-13 * scale, err_msg=name
        )


def test_vmap_per_env_model():
    """β-heterogeneous path: batched model fields ride the lane axis."""
    model = _model()
    B = 5
    rng = np.random.default_rng(3)
    models = [
        model.replace(
            body_mass=model.body_mass * (1 + 0.2 * rng.random(model.nbody)),
            armature=model.armature * (1 + 0.2 * rng.random(model.nv)),
        )
        for _ in range(B)
    ]
    stacked = stack_models(models)
    qpos, qvel = _random_states(model, B, seed=5)

    ref = [
        (
            dynamics.mass_matrix(m, kinematics.fk(m, q)),
            dynamics.bias_forces(m, kinematics.fk(m, q), v),
        )
        for m, q, v in zip(models, qpos, qvel)
    ]

    def batched(m, q, v):
        k = kinematics.fk(m, q)
        return dynamics.mass_matrix(m, k), dynamics.bias_forces(m, k, v)

    M_b, C_b = jax.vmap(batched)(stacked, qpos, qvel)
    M_r = jnp.stack([r[0] for r in ref])
    C_r = jnp.stack([r[1] for r in ref])
    np.testing.assert_allclose(np.asarray(M_b), np.asarray(M_r), atol=1e-11)
    np.testing.assert_allclose(np.asarray(C_b), np.asarray(C_r), atol=1e-11)


def test_grads_through_dispatch():
    """MPC jacfwd route: differentiation uses the plain path and agrees
    with finite differences; vmapped jacfwd compiles."""
    model = _model()
    qpos, qvel = _random_states(model, 3, seed=7)
    kin = kinematics.fk(model, qpos[0])

    g = jax.grad(lambda v: dynamics.bias_forces(model, kin, v).sum())(qvel[0])
    eps = 1e-6
    fd = np.zeros(model.nv)
    for i in range(model.nv):
        cp = dynamics.bias_forces(model, kin, qvel[0].at[i].add(eps)).sum()
        cm = dynamics.bias_forces(model, kin, qvel[0].at[i].add(-eps)).sum()
        fd[i] = float(cp - cm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-6, atol=1e-6)

    jac = jax.vmap(
        jax.jacfwd(
            lambda q: dynamics.mass_matrix(model, kinematics.fk(model, q)).sum(0)
        )
    )(qpos)
    assert jac.shape == (3, model.nv, model.nq)
