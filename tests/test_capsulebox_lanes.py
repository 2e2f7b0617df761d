"""Lanes-last capsule-box narrowphase must match the per-pair reference
(same algorithm, transposed layout; physics/capsulebox_lanes.py). This is the
path every vmapped (training/batched) env runs via capsule_box_op's
custom_vmap rule, so divergence here silently changes batched physics
(ADVICE r2, medium)."""
import numpy as np
from scipy.spatial.transform import Rotation as sRot

import jax
import jax.numpy as jnp

from smplsim_tpu.physics.collision_pairs import (
    capsule_box_contacts,
    capsule_box_op,
)


def _random_pairs(rng, B, P, spread=0.12):
    """Random capsule segments near random boxes, in the box frame."""
    center = rng.normal(size=(B, P, 3)) * spread
    axis = sRot.random(B * P, random_state=rng).as_matrix()[:, :, 2].reshape(
        B, P, 3
    )
    hl = rng.uniform(0.01, 0.12, (B, P, 1))
    lp = center - axis * hl
    lq = center + axis * hl
    half = rng.uniform(0.03, 0.1, (B, P, 3))
    r = rng.uniform(0.01, 0.06, (B, P))
    return [jnp.asarray(x) for x in (lp, lq, half, r)]


def _assert_match(args, atol=1e-11):
    d_l, p_l, n_l = jax.vmap(capsule_box_op)(*args)
    d_r, p_r, n_r = jax.vmap(jax.vmap(
        lambda a, b, c, e: capsule_box_contacts(a, b, c, e, None)
    ))(*args)
    np.testing.assert_allclose(np.asarray(d_l), np.asarray(d_r), atol=atol)
    # positions/normals only meaningful where the slot is plausible
    # (dist < big); inactive slots carry 1e9 sentinels in dist only
    m = np.asarray(d_r) < 1e8
    np.testing.assert_allclose(
        np.asarray(p_l)[m], np.asarray(p_r)[m], atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(n_l)[m], np.asarray(n_r)[m], atol=atol
    )
    return np.asarray(d_r), m


def test_capsulebox_lanes_matches_reference():
    rng = np.random.default_rng(0)
    args = _random_pairs(rng, B=9, P=6)
    d, m = _assert_match(args)
    assert (d[..., 0] < 0).sum() > 10, "expected penetrating samples"


def test_capsulebox_lanes_degenerate_cases():
    rng = np.random.default_rng(1)
    lp, lq, half, r = _random_pairs(rng, B=4, P=5)
    # zero-length segments (spheres)
    lq = lq.at[0].set(lp[0])
    # axis-aligned capsules lying along x through the box
    lp = lp.at[1].set(
        jnp.stack([
            -jnp.ones((5,)) * 0.2,
            jnp.zeros((5,)),
            jnp.full((5,), 0.1),
        ], axis=-1)
    )
    lq = lq.at[1].set(lp[1] * jnp.asarray([-1.0, 1.0, 1.0]))
    # deep penetration: segment through the box center
    lp = lp.at[2].set(lp[2] * 0.05)
    lq = lq.at[2].set(-lp[2])
    _assert_match([lp, lq, half, r])


def test_capsulebox_lanes_separated():
    rng = np.random.default_rng(2)
    lp, lq, half, r = _random_pairs(rng, B=2, P=4, spread=2.0)
    d_l, _, _ = jax.vmap(capsule_box_op)(*[lp, lq, half, r])
    assert np.asarray(d_l)[..., 0].min() > 0.05
    _assert_match([lp, lq, half, r])
