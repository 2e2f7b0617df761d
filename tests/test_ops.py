"""TPU kernel ops: reference-path correctness, dispatch, and derivatives.

The Pallas kernels themselves execute only on TPU hardware (validated there
by tools/bench_kernels.py); on CPU these tests pin down (a) the reference
implementations the kernels are checked against, (b) the custom_vmap
dispatch machinery, and (c) the implicit-function-theorem derivative rules
that iLQR differentiates through.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smplsim_tpu.ops.qp_kernel import newton_qp, newton_qp_reference
from smplsim_tpu.physics import linalg


def _qp_system(rng, K=16, rank=10):
    W = rng.normal(size=(K, rank)) * 0.5
    A = W @ W.T + np.eye(K) * 0.5
    b = rng.normal(size=(K,))
    act = rng.uniform(size=(K,)) > 0.2
    return jnp.asarray(A), jnp.asarray(b), jnp.asarray(act)


def test_newton_qp_solves_kkt():
    rng = np.random.default_rng(0)
    for i in range(5):
        A, b, act = _qp_system(rng)
        f = np.asarray(newton_qp(A, b, act))
        An, bn, actn = map(np.asarray, (A, b, act))
        g = An @ f - bn
        # KKT for min 1/2 f A f - b f, f>=0 restricted to active rows:
        # f > 0 -> g ~ 0 ; f = 0 -> g >= 0 ; inactive rows stay 0
        assert (f[~actn] == 0).all(), i
        on = actn & (f > 1e-9)
        assert np.abs(g[on]).max() < 1e-8, (i, np.abs(g[on]).max())
        off = actn & (f <= 1e-9)
        assert (g[off] > -1e-8).all(), i


def test_newton_qp_vmap_matches_loop():
    rng = np.random.default_rng(1)
    systems = [_qp_system(rng) for _ in range(4)]
    A = jnp.stack([s[0] for s in systems])
    b = jnp.stack([s[1] for s in systems])
    act = jnp.stack([s[2] for s in systems])
    batched = np.asarray(jax.vmap(newton_qp)(A, b, act))
    for i, (Ai, bi, ai) in enumerate(systems):
        np.testing.assert_allclose(
            batched[i], np.asarray(newton_qp(Ai, bi, ai)), atol=1e-10
        )


def test_newton_qp_jacfwd_matches_fd():
    rng = np.random.default_rng(2)
    A, b, act = _qp_system(rng)
    J = np.asarray(jax.jacfwd(lambda b_: newton_qp(A, b_, act))(b))
    f0 = np.asarray(newton_qp(A, b, act))
    eps = 1e-6
    for i in range(b.shape[0]):
        bp = np.asarray(b).copy()
        bp[i] += eps
        fd = (np.asarray(newton_qp(A, jnp.asarray(bp), act)) - f0) / eps
        np.testing.assert_allclose(J[:, i], fd, atol=1e-4)


def test_newton_qp_grad_through_vmap():
    rng = np.random.default_rng(3)
    A, b, act = _qp_system(rng)
    bb = jnp.stack([b, b * 0.5])

    def loss(bb):
        return jax.vmap(newton_qp, (None, 0, None))(A, bb, act).sum()

    g = np.asarray(jax.grad(loss)(bb))
    assert np.isfinite(g).all()


# ---------------------------------------------------------------------------
def test_linalg_cholesky_and_solve_derivatives():
    rng = np.random.default_rng(4)
    n = 6
    X = rng.normal(size=(n, n))
    A = jnp.asarray(X @ X.T + 3 * np.eye(n))
    b = jnp.asarray(rng.normal(size=(n,)))

    def fd_jac(f, x, eps=1e-6):
        x = np.asarray(x)
        out0 = np.asarray(f(jnp.asarray(x)))
        J = np.zeros(out0.shape + x.shape)
        it = np.nditer(x, flags=["multi_index"])
        while not it.finished:
            xp = x.copy()
            xp[it.multi_index] += eps
            J[(...,) + it.multi_index] = (
                np.asarray(f(jnp.asarray(xp))) - out0
            ) / eps
            it.iternext()
        return J

    Jc = np.asarray(jax.jacfwd(linalg.cholesky)(A))
    np.testing.assert_allclose(Jc, fd_jac(linalg.cholesky, A), atol=1e-4)

    g = lambda A_: linalg.cho_solve(linalg.cholesky(A_), b)
    Ja = np.asarray(jax.jacfwd(g)(A))
    np.testing.assert_allclose(Ja, fd_jac(g, A), atol=1e-4)

    # reverse mode through factor+solve
    gr = np.asarray(jax.grad(lambda A_: g(A_).sum())(A))
    grfd = fd_jac(lambda A_: g(A_).sum()[None], A)[0]
    np.testing.assert_allclose(gr, grfd, atol=1e-4)


def test_linalg_vmap_dispatch_matches_loop():
    rng = np.random.default_rng(5)
    n = 9
    X = rng.normal(size=(3, n, n))
    A = jnp.asarray(X @ np.swapaxes(X, 1, 2) + 4 * np.eye(n))
    b = jnp.asarray(rng.normal(size=(3, n)))
    xb = np.asarray(
        jax.vmap(lambda a, x: linalg.cho_solve(linalg.cholesky(a), x))(A, b)
    )
    want = np.linalg.solve(np.asarray(A), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(xb, want, atol=1e-9)


def test_reference_qp_monotone_descent():
    """The line search guarantees the objective never increases."""
    rng = np.random.default_rng(6)
    A, b, act = _qp_system(rng, K=24, rank=12)

    def obj(f):
        return 0.5 * f @ (np.asarray(A) @ f) - np.asarray(b) @ f

    prev = obj(np.zeros(24))
    for iters in (1, 2, 4, 8, 12):
        f = np.asarray(newton_qp_reference(A, b, act, iters=iters))
        cur = obj(f)
        assert cur <= prev + 1e-12, (iters, cur, prev)
        prev = cur
