"""Lanes-last FK must match the per-env reference chain machine-exactly.

`kinematics.fk` dispatches every vmapped (training/batched) call to
physics/fk_lanes.py via a custom_vmap rule, so a divergence there would
silently change batched physics while the unbatched parity suite stays
green (same hazard class as ADVICE r2's capsulebox finding). Covers the
shared-model path, the β-heterogeneous per-env-model path, and grads
through the dispatch (iLQR jacfwd route)."""
import numpy as np

import jax
import jax.numpy as jnp

from smplsim_tpu.models import mjcf
from smplsim_tpu.physics import kinematics
from tests.conftest import REFERENCE_XML


def _model(dtype=jnp.float64):
    with open(REFERENCE_XML) as f:
        return mjcf.parse_mjcf(f.read(), dtype=dtype)


def _random_qpos(model, B, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, model.nq))
    q[:, 3:7] /= np.linalg.norm(q[:, 3:7], axis=1, keepdims=True)
    return jnp.asarray(q)


FIELDS = ("xpos", "xmat", "S", "com", "inertia_w")


def test_vmap_matches_per_env():
    model = _model()
    qpos = _random_qpos(model, 9)
    ref = [kinematics.fk(model, q) for q in qpos]
    bat = jax.vmap(lambda q: kinematics.fk(model, q))(qpos)
    for name in FIELDS:
        r = np.asarray(jnp.stack([getattr(x, name) for x in ref]))
        b = np.asarray(getattr(bat, name))
        np.testing.assert_allclose(b, r, atol=1e-14, err_msg=name)


def test_vmap_per_env_model():
    """β-heterogeneous path: model pytree batched alongside qpos."""
    from smplsim_tpu.models import stack_models

    model = _model()
    B = 5
    rng = np.random.default_rng(3)
    models = [
        model.replace(
            body_pos=model.body_pos * (1 + 0.1 * rng.normal(size=(model.nbody, 1))),
            body_ipos=model.body_ipos * (1 + 0.1 * rng.normal(size=(model.nbody, 1))),
        )
        for _ in range(B)
    ]
    stacked = stack_models(models)
    qpos = _random_qpos(model, B, seed=4)
    ref = [kinematics.fk(m, q) for m, q in zip(models, qpos)]
    bat = jax.vmap(kinematics.fk)(stacked, qpos)
    for name in FIELDS:
        r = np.asarray(jnp.stack([getattr(x, name) for x in ref]))
        b = np.asarray(getattr(bat, name))
        np.testing.assert_allclose(b, r, atol=1e-14, err_msg=name)


def test_grad_and_vmapped_jacfwd():
    model = _model()
    qpos = _random_qpos(model, 4, seed=7)

    g = jax.grad(lambda q: kinematics.fk(model, q).xpos.sum())(qpos[0])
    eps = 1e-6
    fd = np.zeros(model.nq)
    for i in range(model.nq):
        qp = qpos[0].at[i].add(eps)
        qm = qpos[0].at[i].add(-eps)
        fd[i] = float(
            (kinematics.fk(model, qp).xpos.sum() - kinematics.fk(model, qm).xpos.sum())
        ) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, atol=1e-7)

    # jacfwd under vmap (MPC/iLQR route) must compile and agree with
    # per-env jacfwd
    jac_b = jax.vmap(jax.jacfwd(lambda q: kinematics.fk(model, q).com))(qpos)
    jac_r = jnp.stack(
        [jax.jacfwd(lambda q: kinematics.fk(model, q).com)(q) for q in qpos]
    )
    np.testing.assert_allclose(
        np.asarray(jac_b), np.asarray(jac_r), atol=1e-11
    )
