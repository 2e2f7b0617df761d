"""Lanes-last box-box manifold must match the per-pair reference exactly
(same SAT + clipping algorithm, transposed layout; physics/boxbox_lanes.py)."""
import numpy as np
from scipy.spatial.transform import Rotation as sRot

import jax
import jax.numpy as jnp

from smplsim_tpu.physics.collision_pairs import _box_box_one, box_box_manifold_op


def _random_pairs(rng, B, P, sep=0.08):
    def rand_R(n):
        return sRot.random(n, random_state=rng).as_matrix()

    pos1 = rng.normal(size=(B, P, 3)) * 0.05
    pos2 = pos1 + rng.normal(size=(B, P, 3)) * sep
    R1 = rand_R(B * P).reshape(B, P, 3, 3)
    R2 = rand_R(B * P).reshape(B, P, 3, 3)
    h1 = rng.uniform(0.03, 0.1, (B, P, 3))
    h2 = rng.uniform(0.03, 0.1, (B, P, 3))
    margin = np.full((B, P), 0.002)
    return [jnp.asarray(x) for x in (pos1, R1, h1, pos2, R2, h2, margin)]


def test_lanes_matches_reference():
    rng = np.random.default_rng(0)
    args = _random_pairs(rng, B=9, P=6)
    d_l, p_l, n_l, a_l = jax.vmap(box_box_manifold_op)(*args)
    d_r, p_r, n_r, a_r = jax.vmap(jax.vmap(_box_box_one))(*args)
    assert (np.asarray(a_l) == np.asarray(a_r)).all()
    m = np.asarray(a_r)
    assert m.sum() > 20, "expected overlapping boxes in the sample"
    np.testing.assert_allclose(
        np.asarray(d_l)[m], np.asarray(d_r)[m], atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(p_l)[m], np.asarray(p_r)[m], atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(n_l)[m], np.asarray(n_r)[m], atol=1e-12
    )


def test_lanes_deep_and_separated():
    rng = np.random.default_rng(1)
    # deep overlap
    args = _random_pairs(rng, B=4, P=4, sep=0.01)
    _, _, _, a_deep = jax.vmap(box_box_manifold_op)(*args)
    _, _, _, a_ref = jax.vmap(jax.vmap(_box_box_one))(*args)
    assert (np.asarray(a_deep) == np.asarray(a_ref)).all()
    # well separated: nothing active
    args = _random_pairs(rng, B=2, P=3, sep=3.0)
    _, _, _, a_far = jax.vmap(box_box_manifold_op)(*args)
    assert not np.asarray(a_far).any()


def test_jacfwd_through_manifold():
    """iLQR differentiates the dynamics through contacts; the custom_jvp
    must produce finite derivatives."""
    rng = np.random.default_rng(2)
    args = _random_pairs(rng, B=1, P=2)
    unbatched = [a[0] for a in args]

    def f(pos1):
        d, p, n, a = box_box_manifold_op(pos1, *unbatched[1:])
        return jnp.where(a, d, 0.0).sum()

    g = jax.jacfwd(f)(unbatched[0])
    assert np.isfinite(np.asarray(g)).all()
