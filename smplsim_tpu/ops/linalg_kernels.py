"""Batched Cholesky / triangular-solve Pallas TPU kernels.

Same batch-in-lanes design as ops/qp_kernel.py: a (n, n, 128)-lane block of
systems is DMA'd to VMEM once and the whole column recurrence runs on-chip.
These back physics/linalg's `cholesky` / `solve_lower` / `solve_lower_t`
through custom_vmap — per-env physics code keeps calling the single-matrix
API; under `vmap` on TPU the batch lands here, elsewhere the pure-JAX SoA
implementations run (and remain the parity oracle).

Matrices are padded to a multiple of 8 rows (sublane tile) with identity,
right-hand sides with zeros; the batch pads to the 128-lane width.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB = 128


def _pad_n(n: int) -> int:
    return (n + 7) // 8 * 8


# ---------------------------------------------------------------------------
# kernels (per block: A (n,n,BB), rhs (n,m,BB))
# ---------------------------------------------------------------------------
def _chol_kernel(A_ref, L_ref, *, n: int):
    bb = A_ref.shape[-1]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, bb), 0)
    L_ref[:] = A_ref[:]

    def col(j, _):
        rowj = L_ref[pl.ds(j, 1), :, :][0]                      # (n,BB)
        rowj = jnp.where(row_i < j, rowj, 0.0)
        s = jnp.sum(L_ref[:] * rowj[None, :, :], axis=1)        # (n,BB)
        colj = L_ref[:, pl.ds(j, 1), :][:, 0, :]
        c = colj - s
        pj = jnp.sum(jnp.where(row_i == j, c, 0.0), axis=0, keepdims=True)
        pivot = jnp.sqrt(pj)
        newcol = jnp.where(
            row_i == j, pivot, jnp.where(row_i > j, c / pivot, 0.0)
        )
        L_ref[:, pl.ds(j, 1), :] = newcol[:, None, :]
        return 0

    jax.lax.fori_loop(0, n, col, 0)


def _chol_solve_kernel(A_ref, b_ref, L_ref, x_ref, *, n: int):
    """Fused: factor A into L_ref AND solve A x = b (fwd+bwd substitution),
    all in one VMEM residency — replaces three pallas dispatches (chol +
    solve_lower + solve_lower_t) and two HBM round trips of the factor."""
    bb = A_ref.shape[-1]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, bb), 0)
    row_i3 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    L_ref[:] = A_ref[:]
    x_ref[:] = b_ref[:]

    def col(j, _):
        rowj = L_ref[pl.ds(j, 1), :, :][0]
        rowj = jnp.where(row_i < j, rowj, 0.0)
        s = jnp.sum(L_ref[:] * rowj[None, :, :], axis=1)
        colj = L_ref[:, pl.ds(j, 1), :][:, 0, :]
        c = colj - s
        pj = jnp.sum(jnp.where(row_i == j, c, 0.0), axis=0, keepdims=True)
        pivot = jnp.sqrt(pj)
        newcol = jnp.where(
            row_i == j, pivot, jnp.where(row_i > j, c / pivot, 0.0)
        )
        L_ref[:, pl.ds(j, 1), :] = newcol[:, None, :]
        return 0

    def fwd(j, _):
        colj = L_ref[:, pl.ds(j, 1), :]                         # (n,1,BB)
        piv = jnp.sum(jnp.where(row_i3 == j, colj, 0.0), axis=0,
                      keepdims=True)
        xj = x_ref[pl.ds(j, 1), :, :] / piv
        x = x_ref[:]
        x_ref[:] = jnp.where(row_i3 > j, x - colj * xj, x)
        x_ref[pl.ds(j, 1), :, :] = xj
        return 0

    def bwd(t, _):
        j = n - 1 - t
        colj = L_ref[:, pl.ds(j, 1), :]
        piv = jnp.sum(jnp.where(row_i3 == j, colj, 0.0), axis=0,
                      keepdims=True)
        s = jnp.sum(jnp.where(row_i3 > j, colj * x_ref[:], 0.0), axis=0,
                    keepdims=True)
        x_ref[pl.ds(j, 1), :, :] = (x_ref[pl.ds(j, 1), :, :] - s) / piv
        return 0

    jax.lax.fori_loop(0, n, col, 0)
    jax.lax.fori_loop(0, n, fwd, 0)
    jax.lax.fori_loop(0, n, bwd, 0)


@functools.partial(jax.jit)
def chol_solve_batched(A, b):
    """A (B,n,n) SPD, b (B,n) or (B,n,m) -> (L (B,n,n), x (B,n[,m]))."""
    Bn, n = A.shape[0], A.shape[-1]
    vec = b.ndim == 2
    if vec:
        b = b[..., None]
    m = b.shape[-1]
    np_ = _pad_n(n)
    mp = max(_pad_n(m) if m > 1 else 1, 1)
    if np_ != n:
        eye = jnp.eye(np_, dtype=A.dtype)[n:]
        A = jnp.concatenate(
            [jnp.pad(A, ((0, 0), (0, 0), (0, np_ - n))),
             jnp.tile(eye[None], (Bn, 1, 1))], axis=1
        )
        b = jnp.pad(b, ((0, 0), (0, np_ - n), (0, 0)))
    if mp != m:
        b = jnp.pad(b, ((0, 0), (0, 0), (0, mp - m)))
    At, _, Bp = _to_lanes(A)
    bt, Bn, _ = _to_lanes(b)
    pad_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Bp), 2) >= Bn
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1))
    At = jnp.where(pad_lane, eye3.astype(At.dtype), At)

    Lt, xt = pl.pallas_call(
        functools.partial(_chol_solve_kernel, n=np_),
        out_shape=(
            jax.ShapeDtypeStruct((np_, np_, Bp), A.dtype),
            jax.ShapeDtypeStruct((np_, mp, Bp), A.dtype),
        ),
        grid=(Bp // BB,),
        in_specs=[
            pl.BlockSpec((np_, np_, BB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, mp, BB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((np_, np_, BB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, mp, BB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ),
    )(At, bt)
    L = jnp.moveaxis(Lt, -1, 0)[:Bn, :n, :n]
    x = jnp.moveaxis(xt, -1, 0)[:Bn, :n, :m]
    return L, (x[..., 0] if vec else x)


_PANEL = 16


def _chol_solve_only_kernel(A_ref, b_ref, x_ref, L_ref, *, n: int,
                            diag_ref=None):
    """Factor A (+ optional diagonal shift) into VMEM scratch and solve
    A x = b for this grid step's rhs chunk. The factor never reaches HBM.
    Grid is (batch blocks, rhs chunks) with the rhs axis minor, so the
    factorization runs ONCE per batch block (at rhs chunk 0) and persists
    in scratch across that block's chunks. diag_ref (n,1,BB), when given,
    adds a per-lane diagonal before factoring (the stable-PD
    H = M + dt*diag(kd) assembly, fused so H never materializes in HBM).

    Everything is PANEL-BLOCKED (r5): the naive column recurrences touch
    the whole matrix / whole rhs every column — O(n) full-array VMEM passes
    that made both the factor and the substitutions bandwidth-bound. Here
    per-column work stays inside an (n-s, r) panel slab and the cross-panel
    coupling is one rank-r update per panel, so total VMEM traffic drops
    ~n/r-fold. Only the lower triangle is ever read or written."""
    r = _PANEL

    def factor():
        if diag_ref is None:
            L_ref[:] = A_ref[:]
        else:
            eye3 = (jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1))
            L_ref[:] = A_ref[:] + jnp.where(eye3, diag_ref[:, :, :], 0.0)

        for s in range(0, n, r):
            e = min(n, s + r)
            rp = e - s
            h = n - s
            col_io = jax.lax.broadcasted_iota(jnp.int32, (1, rp, 1), 1)
            bb = A_ref.shape[-1]
            row2 = jax.lax.broadcasted_iota(jnp.int32, (h, bb), 0)

            def col(jj, _, s=s, e=e, rp=rp, h=h, col_io=col_io, row2=row2):
                # single slab pass: c = A[s:,j] - L[s:, s:j] @ L[j, s:j]
                S_ = L_ref[s:n, s:e, :]                       # (h, rp, BB)
                rowj = L_ref[pl.ds(s + jj, 1), s:e, :]        # (1, rp, BB)
                rowj = jnp.where(col_io < jj, rowj, 0.0)
                cj = L_ref[s:n, pl.ds(s + jj, 1), :][:, 0, :]
                c = cj - jnp.sum(S_ * rowj, axis=1)           # (h, BB)
                piv = jnp.sqrt(
                    jnp.sum(jnp.where(row2 == jj, c, 0.0), axis=0,
                            keepdims=True))                   # (1, BB)
                newcol = jnp.where(
                    row2 == jj, piv, jnp.where(row2 > jj, c / piv, 0.0))
                L_ref[s:n, pl.ds(s + jj, 1), :] = newcol[:, None, :]
                return 0

            jax.lax.fori_loop(0, rp, col, 0)
            # trailing Schur update: L[e:, e:] -= T T^T, rank-8 chunks
            if e < n:
                T = L_ref[e:n, s:e, :]                        # (n-e, rp, BB)
                for c0 in range(0, rp, 8):
                    upd = 0.0
                    for c in range(c0, min(rp, c0 + 8)):
                        Tc = jax.lax.index_in_dim(T, c, axis=1,
                                                  keepdims=False)
                        upd = upd + Tc[:, None, :] * Tc[None, :, :]
                    L_ref[e:n, e:n, :] = L_ref[e:n, e:n, :] - upd

    @pl.when(pl.program_id(1) == 0)
    def _():
        factor()

    x_ref[:] = b_ref[:]

    # ---- blocked forward substitution: within-panel column loop on the
    # (rp, mc) slice, then ONE panel-rank update of the rows below ----
    for s in range(0, n, r):
        e = min(n, s + r)
        rp = e - s
        rio = jax.lax.broadcasted_iota(jnp.int32, (rp, 1, 1), 0)

        def fwd(jj, _, s=s, e=e, rp=rp, rio=rio):
            colj = L_ref[s:e, pl.ds(s + jj, 1), :]            # (rp,1,BB)
            piv = jnp.sum(jnp.where(rio == jj, colj, 0.0), axis=0,
                          keepdims=True)
            xj = x_ref[pl.ds(s + jj, 1), :, :] / piv
            xs = x_ref[s:e, :, :]
            x_ref[s:e, :, :] = jnp.where(rio > jj, xs - colj * xj, xs)
            x_ref[pl.ds(s + jj, 1), :, :] = xj
            return 0

        jax.lax.fori_loop(0, rp, fwd, 0)
        if e < n:
            xs = x_ref[s:e, :, :]                             # (rp, mc, BB)
            upd = 0.0
            for c in range(rp):
                Lc = L_ref[e:n, pl.ds(s + c, 1), :]           # (n-e,1,BB)
                xc = jax.lax.index_in_dim(xs, c, axis=0, keepdims=True)
                upd = upd + Lc * xc
            x_ref[e:n, :, :] = x_ref[e:n, :, :] - upd

    # ---- blocked back substitution (panels last to first) ----
    for s in range(((n - 1) // r) * r, -1, -r):
        e = min(n, s + r)
        rp = e - s
        rio = jax.lax.broadcasted_iota(jnp.int32, (rp, 1, 1), 0)
        if e < n:
            # subtract contributions of already-solved x[e:]:
            # x[s:e] -= L[e:, s:e]^T @ x[e:]
            xe = x_ref[e:n, :, :]                             # (n-e, mc, BB)
            for c in range(rp):
                Lc = L_ref[e:n, pl.ds(s + c, 1), :]           # (n-e,1,BB)
                # row c of the update: sum_i L[e+i, s+c] x[e+i, m]
                upd_c = jnp.sum(Lc * xe, axis=0, keepdims=True)
                x_ref[pl.ds(s + c, 1), :, :] = (
                    x_ref[pl.ds(s + c, 1), :, :] - upd_c)

        def bwd(t, _, s=s, e=e, rp=rp, rio=rio):
            jj = rp - 1 - t
            colj = L_ref[s:e, pl.ds(s + jj, 1), :]            # (rp,1,BB)
            piv = jnp.sum(jnp.where(rio == jj, colj, 0.0), axis=0,
                          keepdims=True)
            xs = x_ref[s:e, :, :]
            ss = jnp.sum(jnp.where(rio > jj, colj * xs, 0.0), axis=0,
                         keepdims=True)
            x_ref[pl.ds(s + jj, 1), :, :] = (
                x_ref[pl.ds(s + jj, 1), :, :] - ss) / piv
            return 0

        jax.lax.fori_loop(0, rp, bwd, 0)


_MCHUNK_LANES = 40   # rhs columns per grid step (VMEM budget: the (n,n,BB)
                     # operand + scratch factor dominate; chunking the rhs
                     # keeps the pallas scoped-vmem footprint under the 16MB
                     # default limit at n=80, while fewer chunks keep the
                     # sequential substitution-step count down)


def chol_solve_lanes(At, bt, diag_t=None):
    """Lanes-native fused factor+solve: At (n,n,B) SPD, bt (n,m,B),
    optional diag_t (n,B) added to the diagonal before factoring.
    Returns xt (n,m,B) with A x = b per lane. No layout changes, no HBM
    factor: callers keep the batch in lanes end-to-end (the substep spine).
    n must be a multiple of 8 (pad with identity rows); the lane axis is
    padded to 128 here (identity systems)."""
    n, m, Bn = bt.shape
    assert At.shape == (n, n, Bn) and n % 8 == 0
    dtype = At.dtype
    padl = (-Bn) % BB
    if padl:
        eye3 = (jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1))
        At = jnp.concatenate(
            [At, jnp.broadcast_to(eye3.astype(dtype), (n, n, padl))], axis=-1)
        bt = jnp.pad(bt, ((0, 0), (0, 0), (0, padl)))
        if diag_t is not None:
            diag_t = jnp.pad(diag_t, ((0, 0), (0, padl)))
    Bp = Bn + padl
    mc = min(_MCHUNK_LANES, _pad_n(m) if m > 1 else 1)
    mp = (m + mc - 1) // mc * mc
    if mp != m:
        bt = jnp.pad(bt, ((0, 0), (0, mp - m), (0, 0)))

    grid = (Bp // BB, mp // mc)
    in_specs = [
        pl.BlockSpec((n, n, BB), lambda i, j: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n, mc, BB), lambda i, j: (0, j, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [At, bt]
    if diag_t is not None:
        in_specs.append(pl.BlockSpec((n, 1, BB), lambda i, j: (0, 0, i),
                                     memory_space=pltpu.VMEM))
        args.append(diag_t[:, None, :])

        def kern(A_ref, b_ref, d_ref, x_ref, L_ref):
            _chol_solve_only_kernel(A_ref, b_ref, x_ref, L_ref, n=n,
                                    diag_ref=d_ref)
    else:
        def kern(A_ref, b_ref, x_ref, L_ref):
            _chol_solve_only_kernel(A_ref, b_ref, x_ref, L_ref, n=n)

    xt = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, mp, Bp), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((n, mc, BB), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n, BB), dtype)],
        # the (n,n,BB) operand + factor scratch + rhs buffers exceed the
        # conservative 16MB default scoped-vmem budget at n=80; the chip
        # has far more VMEM than the default assumes
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(*args)
    return xt[:, :m, :Bn]


def _solve_lower_kernel(L_ref, b_ref, x_ref, *, n: int, trans: bool):
    row_i3 = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    x_ref[:] = b_ref[:]

    def fwd(j, _):
        colj = L_ref[:, pl.ds(j, 1), :]                         # (n,1,BB)
        piv = jnp.sum(jnp.where(row_i3 == j, colj, 0.0), axis=0,
                      keepdims=True)                            # (1,1,BB)
        xj = x_ref[pl.ds(j, 1), :, :] / piv                     # (1,m,BB)
        x = x_ref[:]
        x_ref[:] = jnp.where(row_i3 > j, x - colj * xj, x)
        x_ref[pl.ds(j, 1), :, :] = xj
        return 0

    def bwd(t, _):
        j = n - 1 - t
        colj = L_ref[:, pl.ds(j, 1), :]                         # (n,1,BB)
        piv = jnp.sum(jnp.where(row_i3 == j, colj, 0.0), axis=0,
                      keepdims=True)
        # s = sum_{k>j} L[k,j] x[k]
        s = jnp.sum(jnp.where(row_i3 > j, colj * x_ref[:], 0.0), axis=0,
                    keepdims=True)                              # (1,m,BB)
        x_ref[pl.ds(j, 1), :, :] = (x_ref[pl.ds(j, 1), :, :] - s) / piv
        return 0

    jax.lax.fori_loop(0, n, bwd if trans else fwd, 0)


# ---------------------------------------------------------------------------
# batched wrappers (B, ...) -> (B, ...)
# ---------------------------------------------------------------------------
def _to_lanes(x, bb=BB):
    """(B, ...) -> (..., Bp) with lane padding; returns (xt, B, Bp)."""
    Bn = x.shape[0]
    pad = (-Bn) % bb
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    return jnp.moveaxis(x, 0, -1), Bn, Bn + pad


@functools.partial(jax.jit)
def cholesky_batched(A):
    """A (B,n,n) SPD -> lower L (B,n,n)."""
    Bn, n = A.shape[0], A.shape[-1]
    np_ = _pad_n(n)
    if np_ != n:
        eye = jnp.eye(np_, dtype=A.dtype)[n:]
        A = jnp.concatenate(
            [jnp.pad(A, ((0, 0), (0, 0), (0, np_ - n))),
             jnp.tile(eye[None], (Bn, 1, 1))], axis=1
        )
    At, Bn, Bp = _to_lanes(A)
    # padded batch entries must stay SPD: splice identity on the diagonal
    pad_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Bp), 2) >= Bn
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1))
    At = jnp.where(pad_lane, eye3.astype(At.dtype), At)

    Lt = pl.pallas_call(
        functools.partial(_chol_kernel, n=np_),
        out_shape=jax.ShapeDtypeStruct((np_, np_, Bp), A.dtype),
        grid=(Bp // BB,),
        in_specs=[pl.BlockSpec((np_, np_, BB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((np_, np_, BB), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
    )(At)
    return jnp.moveaxis(Lt, -1, 0)[:Bn, :n, :n]


@functools.partial(jax.jit, static_argnames=("trans",))
def solve_lower_batched(L, b, trans: bool = False):
    """L (B,n,n) lower; b (B,n) or (B,n,m). Solves L x = b (or L^T x = b)."""
    Bn, n = L.shape[0], L.shape[-1]
    vec = b.ndim == 2
    if vec:
        b = b[..., None]
    m = b.shape[-1]
    np_ = _pad_n(n)
    mp = max(_pad_n(m) if m > 1 else 1, 1)
    if np_ != n:
        # pad L with identity block, b with zero rows
        Lp = jnp.zeros((Bn, np_, np_), L.dtype)
        Lp = Lp.at[:, :n, :n].set(L)
        Lp = Lp.at[:, n:, n:].set(jnp.eye(np_ - n, dtype=L.dtype))
        L = Lp
        b = jnp.pad(b, ((0, 0), (0, np_ - n), (0, 0)))
    if mp != m:
        b = jnp.pad(b, ((0, 0), (0, 0), (0, mp - m)))

    MCHUNK = 32
    if mp > MCHUNK:
        mp2 = (mp + MCHUNK - 1) // MCHUNK * MCHUNK
        if mp2 != mp:
            b = jnp.pad(b, ((0, 0), (0, 0), (0, mp2 - mp)))
            mp = mp2
        mchunk = MCHUNK
    else:
        mchunk = mp
    Lt, _, Bp = _to_lanes(L)
    bt, Bn, _ = _to_lanes(b)
    # padded lanes: identity matrix avoids 0/0
    pad_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Bp), 2) >= Bn
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (np_, np_, 1), 1))
    Lt = jnp.where(pad_lane, eye3.astype(Lt.dtype), Lt)

    xt = pl.pallas_call(
        functools.partial(_solve_lower_kernel, n=np_, trans=trans),
        out_shape=jax.ShapeDtypeStruct((np_, mp, Bp), L.dtype),
        grid=(Bp // BB, mp // mchunk),
        in_specs=[
            pl.BlockSpec((np_, np_, BB), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, mchunk, BB), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((np_, mchunk, BB), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
    )(Lt, bt)
    x = jnp.moveaxis(xt, -1, 0)[:Bn, :n, :m]
    return x[..., 0] if vec else x
