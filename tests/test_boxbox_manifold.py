"""mjc_BoxBox manifold equivalence: the decoded JAX box-box narrowphase
(physics/collision_pairs._box_box_one — SAT codes, face clip regimes,
edge-code enumeration, filters, 8-cap) must reproduce mujoco 3.10's
emitted point sets exactly (reference behavior:
mujoco.mj_collision via tests' two-box probe; decode notes:
tools/boxbox_asm_notes.md).

Known residual (documented): at >50% interpenetration mujoco emits one
extra very deep point from an undecoded mechanism; such states are beyond
any simulated regime, so the random-family gate allows <=1% of configs to
miss, while the structured tilt family must be exact.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from verify_boxbox_hypotheses import (  # noqa: E402
    match, mj_contacts, quat_mat, sat_axis,
)

from smplsim_tpu.physics.collision_pairs import _box_box_one  # noqa: E402


def _gen(fam, n, seed):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        s1 = rng.uniform(0.03, 0.09, 3)
        s2 = rng.uniform(0.03, 0.09, 3)
        if fam == "random":
            q2 = rng.normal(size=4)
            q2 /= np.linalg.norm(q2)
            dirn = rng.normal(size=3)
            dirn /= np.linalg.norm(dirn)
            pos2 = dirn * rng.uniform(0.3, 1.0) * (s1 + s2).max()
        else:
            th = rng.uniform(0, np.pi / 3)
            yaw = rng.uniform(-0.3, 0.3)
            qx = np.array([np.cos(th / 2), np.sin(th / 2), 0, 0])
            w1, x1, y1, z1 = qx
            w2, x2, y2, z2 = np.array(
                [np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]
            )
            q2 = np.array([
                w1 * w2 - z1 * z2, x1 * w2 + y1 * z2,
                y1 * w2 - x1 * z2, z1 * w2 + w1 * z2,
            ])
            q2 /= np.linalg.norm(q2)
            pos2 = np.array([
                rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02),
                s1[2] + s2[2] * rng.uniform(0.6, 1.0),
            ])
        out.append((s1, s2, q2, pos2))
    return out


def _score(fam, n, seed):
    cfgs = [
        c for c in _gen(fam, n, seed)
        if sat_axis(np.zeros(3), np.eye(3), c[0], c[3], quat_mat(c[2]),
                    c[1])[1] >= -0.002
    ]
    B = len(cfgs)
    vf = jax.jit(jax.vmap(_box_box_one))
    d, p, _, act = vf(
        jnp.zeros((B, 3), jnp.float64),
        jnp.tile(jnp.eye(3, dtype=jnp.float64), (B, 1, 1)),
        jnp.asarray(np.stack([c[0] for c in cfgs])),
        jnp.asarray(np.stack([c[3] for c in cfgs])),
        jnp.asarray(np.stack([quat_mat(c[2]) for c in cfgs])),
        jnp.asarray(np.stack([c[1] for c in cfgs])),
        jnp.full(B, 0.002, jnp.float64),
    )
    d, p, act = np.asarray(d), np.asarray(p), np.asarray(act)
    hit = tot = 0
    for bi, (s1, s2, q2, pos2) in enumerate(cfgs):
        cons = mj_contacts(pos2, q2, s1, s2)
        pred = [(d[bi, k], p[bi, k]) for k in range(act.shape[1])
                if act[bi, k]]
        ok = match(cons, pred) if cons else (len(pred) == 0)
        hit += int(bool(ok))
        tot += 1
    return hit, tot


@pytest.mark.slow
def test_boxbox_tilt_exact():
    hit, tot = _score("tilt", 200, 0)
    assert tot > 100
    assert hit == tot, f"tilt family not exact: {hit}/{tot}"


@pytest.mark.slow
def test_boxbox_random_orientations():
    hit, tot = _score("random", 600, 1)
    assert tot > 300
    assert hit >= 0.99 * tot, f"random family below gate: {hit}/{tot}"
