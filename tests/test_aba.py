"""physics/aba.py vs the dense Cholesky solve: the articulated-body
elimination must reproduce x = (M + diag)^-1 rhs for the CRBA mass matrix
(dynamics._mass_one) exactly up to rounding, including multi-rhs and the
stable-PD diagonal shift, on random humanoid configurations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smplsim_tpu.models import registry
from smplsim_tpu.physics import aba, dynamics, kinematics


def _case(seed, dtype):
    model = registry.default_humanoid(dtype=dtype)
    rng = np.random.RandomState(seed)
    qpos = np.asarray(model.qpos0, np.float64).copy()
    qpos[:3] += rng.randn(3) * 0.5
    quat = rng.randn(4)
    qpos[3:7] = quat / np.linalg.norm(quat)
    qpos[7:] += rng.randn(model.nv - 6) * 0.4
    kin = kinematics.fk(model, jnp.asarray(qpos, dtype))
    return model, kin


@pytest.mark.parametrize("dtype,tol", [(jnp.float64, 1e-9), (jnp.float32, 2e-4)])
@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("m", [1, 33])
def test_aba_matches_dense_solve(dtype, tol, seed, m):
    model, kin = _case(seed, dtype)
    nv = model.nv
    rng = np.random.RandomState(seed + 100)
    rhs = jnp.asarray(rng.randn(nv, m) * 50.0, dtype)
    # stable-PD-style diagonal shift on top of armature
    extra = jnp.asarray(
        np.concatenate([np.zeros(6), rng.rand(nv - 6) * 2.0]), dtype)

    M = dynamics.mass_matrix(model, kin)
    Md = np.asarray(M, np.float64) + np.diag(np.asarray(extra, np.float64))
    want = np.linalg.solve(Md, np.asarray(rhs, np.float64))

    got = jax.jit(
        lambda S, c, iw, xp, d, r: aba.mass_solve(
            model.parents, S, c, iw, xp, model.body_mass, d, r)
    )(kin.S, kin.com, kin.inertia_w, kin.xpos, model.armature + extra, rhs)

    scale = np.abs(want).max()
    np.testing.assert_allclose(
        np.asarray(got, np.float64), want, atol=tol * scale, rtol=0)


def test_aba_vmap_lanes_layout():
    """Trailing-axis vmap (the spine's lanes dispatch) matches per-env."""
    dtype = jnp.float32
    model, _ = _case(0, dtype)
    nv = model.nv
    B = 5
    kins, rhss = [], []
    for s in range(B):
        _, kin = _case(s, dtype)
        kins.append(kin)
        rhss.append(np.random.RandomState(s).randn(nv, 7))
    S = jnp.stack([k.S for k in kins], axis=-1)
    com = jnp.stack([k.com for k in kins], axis=-1)
    iw = jnp.stack([k.inertia_w for k in kins], axis=-1)
    xp = jnp.stack([k.xpos for k in kins], axis=-1)
    rhs = jnp.asarray(np.stack(rhss, axis=-1), dtype)

    fn = jax.vmap(
        lambda s, c, i, xp, r: aba.mass_solve(
            model.parents, s, c, i, xp, model.body_mass, model.armature, r),
        in_axes=(-1, -1, -1, -1, -1), out_axes=-1)
    out = jax.jit(fn)(S, com, iw, xp, rhs)
    for b in range(B):
        ref = aba.mass_solve(model.parents, kins[b].S, kins[b].com,
                             kins[b].inertia_w, kins[b].xpos,
                             model.body_mass, model.armature, rhs[..., b])
        # jit-vmap vs eager per-env differ only by reduction order; both sit
        # at the ~1e-6-relative f32 envelope (measured: dense f32 Cholesky
        # lands at the same error), so compare at a few x that.
        scale = np.abs(np.asarray(ref)).max()
        np.testing.assert_allclose(np.asarray(out[..., b]), np.asarray(ref),
                                   atol=5e-6 * scale, rtol=0)
