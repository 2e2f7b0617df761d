"""Batched dense linear algebra tuned for TPU.

XLA's `jnp.linalg.cholesky` / `triangular_solve` lower to column-sequential
kernels that run at ~10 GFLOP/s for batches of small matrices on TPU — they
dominate the physics substep (the mass-matrix factorization and the contact
QP's masked Newton solves). These replacements keep the classical algorithms
but express every column update as a BATCHED matrix-vector contraction, so
under `vmap` the whole batch rides the vector units: n fused GEMV steps
instead of n*n scalar ops.

Exactness: same Cholesky / forward-backward substitution recurrences, only
the reduction order changes — parity tests (1e-8 vs MuJoCo in f64) hold.

All functions are written for a SINGLE matrix and designed to be `vmap`ped
(loop indices are batch-invariant, so gathers lower to dynamic slices).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _cholesky_ref(A: jax.Array) -> jax.Array:
    """Lower Cholesky of SPD A (n,n); vmap for batches."""
    n = A.shape[-1]
    idx = jnp.arange(n)

    def body(j, L):
        # row j restricted to finalized columns k<j
        rowj = jax.lax.dynamic_slice_in_dim(L, j, 1, axis=0)[0]
        rowj = jnp.where(idx < j, rowj, 0.0)
        # s[i] = sum_{k<j} L[i,k] L[j,k]
        s = L @ rowj
        colj = jax.lax.dynamic_slice_in_dim(L, j, 1, axis=1)[:, 0]
        c = colj - s
        pj = jax.lax.dynamic_index_in_dim(c, j, keepdims=False)
        pivot = jnp.sqrt(pj)
        newcol = jnp.where(
            idx == j, pivot, jnp.where(idx > j, c / pivot, 0.0)
        )
        return jax.lax.dynamic_update_slice_in_dim(
            L, newcol[:, None], j, axis=1
        )

    return jax.lax.fori_loop(0, n, body, A)


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution: x with L x = b. b is (n,) or (n, m)."""
    n = L.shape[-1]
    idx = jnp.arange(n)
    vec = b.ndim == 1
    y = b[:, None] if vec else b

    def body(j, y):
        colj = jax.lax.dynamic_slice_in_dim(L, j, 1, axis=1)[:, 0]
        yj = jax.lax.dynamic_slice_in_dim(y, j, 1, axis=0)[0]
        piv = jax.lax.dynamic_index_in_dim(colj, j, keepdims=False)
        yj = yj / piv
        below = (idx > j).astype(L.dtype)[:, None]
        y = y - (colj[:, None] * below) * yj[None, :]
        return jax.lax.dynamic_update_slice_in_dim(y, yj[None, :], j, axis=0)

    y = jax.lax.fori_loop(0, n, body, y)
    return y[:, 0] if vec else y


def solve_lower_t(L: jax.Array, b: jax.Array) -> jax.Array:
    """Back substitution: x with L^T x = b. b is (n,) or (n, m)."""
    n = L.shape[-1]
    idx = jnp.arange(n)
    vec = b.ndim == 1
    x = b[:, None] if vec else b

    def body(t, x):
        j = n - 1 - t
        colj = jax.lax.dynamic_slice_in_dim(L, j, 1, axis=1)[:, 0]
        piv = jax.lax.dynamic_index_in_dim(colj, j, keepdims=False)
        mask = (idx > j).astype(L.dtype)
        # s = sum_{k>j} L[k,j] x[k]
        s = (colj * mask) @ x
        xj = jax.lax.dynamic_slice_in_dim(x, j, 1, axis=0)[0]
        xj = (xj - s) / piv
        return jax.lax.dynamic_update_slice_in_dim(x, xj[None, :], j, axis=0)

    x = jax.lax.fori_loop(0, n, body, x)
    return x[:, 0] if vec else x


def _cho_solve_ref(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given lower Cholesky L of A."""
    return solve_lower_t(L, solve_lower(L, b))


# ---------------------------------------------------------------------------
# public ops: kernel dispatch under vmap (TPU) + implicit-function derivatives
# ---------------------------------------------------------------------------
def _is_f32(*xs):
    return all(x.dtype == jnp.float32 for x in xs)


@jax.custom_batching.custom_vmap
def _cholesky_vmappable(A):
    return _cholesky_ref(A)


@_cholesky_vmappable.def_vmap
def _cholesky_vmap(axis_size, in_batched, A):
    (A_b,) = in_batched
    if not A_b:
        A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
    if not _is_f32(A):
        return jax.vmap(_cholesky_ref)(A), True
    from smplsim_tpu.ops import linalg_kernels as lk

    return jax.lax.platform_dependent(
        A, tpu=lk.cholesky_batched, default=jax.vmap(_cholesky_ref)
    ), True


@jax.custom_jvp
def cholesky(A: jax.Array) -> jax.Array:
    """Lower Cholesky of SPD A (n,n); vmap for batches (fused TPU kernel)."""
    return _cholesky_vmappable(A)


@cholesky.defjvp
def _cholesky_jvp(primals, tangents):
    (A,), (dA,) = primals, tangents
    L = _cholesky_vmappable(A)
    if isinstance(dA, jax.custom_derivatives.SymbolicZero):
        return L, jnp.zeros_like(L)
    # the implementation reads only tril(A); lift the tangent to the
    # symmetric matrix the factorization effectively factors
    dA = jnp.tril(dA) + jnp.tril(dA, -1).T
    # dL = L phi(L^-1 dA L^-T), phi = tril with halved diagonal
    T1 = solve_lower(L, dA)
    Z = solve_lower(L, T1.T).T
    phi = jnp.tril(Z) - 0.5 * jnp.diag(jnp.diag(Z))
    return L, L @ phi


@jax.custom_batching.custom_vmap
def _tri_lower_vmappable(L, b):
    return solve_lower(L, b)


@_tri_lower_vmappable.def_vmap
def _tri_lower_vmap(axis_size, in_batched, L, b):
    L_b, b_b = in_batched
    if not L_b:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not b_b:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    if not _is_f32(L, b):
        return jax.vmap(solve_lower)(L, b), True
    from smplsim_tpu.ops import linalg_kernels as lk

    return jax.lax.platform_dependent(
        L, b,
        tpu=lambda l, r: lk.solve_lower_batched(l, r, trans=False),
        default=jax.vmap(solve_lower),
    ), True


@jax.custom_jvp
def tri_solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Forward substitution L x = b (vmap -> fused TPU kernel).

    The half-Delassus building block: the solver forms Y = L^-1 J^T once and
    takes A = Y^T Y, replacing a full cho_solve (forward + backward pass over
    K right-hand sides) with a single forward pass."""
    return _tri_lower_vmappable(L, b)


@tri_solve_lower.defjvp
def _tri_solve_lower_jvp(primals, tangents):
    L, b = primals
    dL, db = tangents
    x = _tri_lower_vmappable(L, b)
    rhs = jnp.zeros_like(x)
    if not isinstance(db, jax.custom_derivatives.SymbolicZero):
        rhs = rhs + db
    if not isinstance(dL, jax.custom_derivatives.SymbolicZero):
        rhs = rhs - jnp.tril(dL) @ x
    dx = solve_lower(L, rhs)
    return x, dx


@jax.custom_batching.custom_vmap
def _cho_factor_solve_vmappable(A, b):
    L = _cholesky_ref(A)
    return L, _cho_solve_ref(L, b)


@_cho_factor_solve_vmappable.def_vmap
def _cho_factor_solve_vmap(axis_size, in_batched, A, b):
    A_b, b_b = in_batched
    if not A_b:
        A = jnp.broadcast_to(A[None], (axis_size,) + A.shape)
    if not b_b:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    if not _is_f32(A, b):
        def ref(A, b):
            L = jax.vmap(_cholesky_ref)(A)
            return L, jax.vmap(_cho_solve_ref)(L, b)
        return ref(A, b), (True, True)
    from smplsim_tpu.ops import linalg_kernels as lk

    def ref32(A, b):
        L = jax.vmap(_cholesky_ref)(A)
        return L, jax.vmap(_cho_solve_ref)(L, b)

    return jax.lax.platform_dependent(
        A, b, tpu=lk.chol_solve_batched, default=ref32
    ), (True, True)


@jax.custom_jvp
def cho_factor_solve(A: jax.Array, b: jax.Array):
    """Fused (cholesky(A), solve(A, b)) — ONE TPU kernel dispatch and one
    VMEM residency instead of three (factor + forward + backward), for the
    per-substep mass-matrix factor-and-solve pairs (smooth dynamics and the
    stable-PD (M + dt*Kd) solve)."""
    return _cho_factor_solve_vmappable(A, b)


@cho_factor_solve.defjvp
def _cho_factor_solve_jvp(primals, tangents):
    (A, b), (dA, db) = primals, tangents
    L, x = _cho_factor_solve_vmappable(A, b)
    SZ = jax.custom_derivatives.SymbolicZero
    # dL via the cholesky differential; dx via implicit function theorem
    if isinstance(dA, SZ):
        dL = jnp.zeros_like(L)
        rhs = jnp.zeros_like(x) if isinstance(db, SZ) else db
    else:
        dAs = jnp.tril(dA) + jnp.tril(dA, -1).T
        T1 = solve_lower(L, dAs)
        Z = solve_lower(L, T1.T).T
        phi = jnp.tril(Z) - 0.5 * jnp.diag(jnp.diag(Z))
        dL = L @ phi
        rhs = (jnp.zeros_like(x) if isinstance(db, SZ) else db) - dAs @ x
    dx = _cho_solve_ref(L, rhs)
    return (L, x), (dL, dx)


@jax.custom_batching.custom_vmap
def _cho_solve_vmappable(L, b):
    return _cho_solve_ref(L, b)


@_cho_solve_vmappable.def_vmap
def _cho_solve_vmap(axis_size, in_batched, L, b):
    L_b, b_b = in_batched
    if not L_b:
        L = jnp.broadcast_to(L[None], (axis_size,) + L.shape)
    if not b_b:
        b = jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    if not _is_f32(L, b):
        return jax.vmap(_cho_solve_ref)(L, b), True
    from smplsim_tpu.ops import linalg_kernels as lk

    def kernel_path(L, b):
        y = lk.solve_lower_batched(L, b, trans=False)
        return lk.solve_lower_batched(L, y, trans=True)

    return jax.lax.platform_dependent(
        L, b, tpu=kernel_path, default=jax.vmap(_cho_solve_ref)
    ), True


@jax.custom_jvp
def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b given lower Cholesky L of A (vmap -> fused TPU kernels)."""
    return _cho_solve_vmappable(L, b)


@cho_solve.defjvp
def _cho_solve_jvp(primals, tangents):
    L, b = primals
    dL, db = tangents
    x = _cho_solve_vmappable(L, b)
    zero_dL = isinstance(dL, jax.custom_derivatives.SymbolicZero)
    zero_db = isinstance(db, jax.custom_derivatives.SymbolicZero)
    rhs = jnp.zeros_like(x)
    if not zero_db:
        rhs = rhs + db
    if not zero_dL:
        # dA = dL L^T + L dL^T;  dx = A^-1 (db - dA x)
        u = L.T @ x
        v = dL.T @ x
        rhs = rhs - (dL @ u + L @ v)
    # reference path for the tangent: plain ops keep it transposable for
    # reverse mode (custom_vmap calls have no transpose rule)
    dx = _cho_solve_ref(L, rhs)
    return x, dx
