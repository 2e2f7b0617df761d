"""Fused Pallas TPU kernel for the contact-QP projected-Newton solve.

The physics substep's hot op: minimize 1/2 f^T A f - b^T f over f >= 0 with
projected-Newton iterations (masked Cholesky + projected-arc line search; see
physics/solver.py for the algorithm and its MuJoCo parity).

Why a kernel: each Newton iteration refactorizes the masked 64x64 system.
Under plain XLA the loop state round-trips HBM every iteration (~40 ms per
substep at batch 1024). Here one grid step pulls a (K, K, 128)-lane block of
systems into VMEM and runs ALL iterations on-chip — the batch lives in the
lane dimension, so every column update is an (K, 128)-wide VPU op and HBM is
touched exactly twice (read A/b/act, write f).

Warm start + early exit: the solver passes the previous substep's forces as
f0; iterations stop once every lane in the block satisfies the projected-
gradient KKT residual  max_i |f_i - max(f_i - g_i, 0)| <= tol * (1 + max|b|)
(the fixed-point condition of the projection; exactly zero at the unique
minimizer of the strictly convex QP). At 450 Hz contact sets barely change
between substeps, so a warm-started block typically converges in 1-3
iterations instead of the cold-start ~10-12. The iteration cap keeps the
cold-start behavior (and parity) unchanged in the worst case.

The public `newton_qp` is a `jax.custom_batching.custom_vmap`: unbatched
calls (CPU tests, odd shapes, f64) run the reference scan implementation;
`vmap` over env batches dispatches the whole batch to this kernel on TPU
(reference path elsewhere) via `jax.lax.platform_dependent`.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BB = 128          # batch elements per block = lane width

# Iteration cap. Cold-started contact-rich (lying-pose) systems need ~15-40
# iterations for the 1e-8 qacc parity gate; the KKT early exit makes the cap
# cheap (warm-started substeps converge in 1-3). SMPLSIM_QP_ITERS overrides
# for product-rate operation: tools/calibrate_solver.py measures the
# iterations/tol -> 150-step trajectory-divergence curve against the 1e-2
# product gate (BASELINE.md), which needs far less than row-level parity.
NEWTON_ITERS = int(os.environ.get("SMPLSIM_QP_ITERS", 40))

_LS_STEPS = (1.0, 0.5, 0.25, 0.0625, 0.015625)

# KKT tolerance (relative to 1 + max|b|). f64 effectively reproduces the
# fixed-12-iteration result (machine-precision fixed point); f32 stops at
# the single-precision noise floor. SMPLSIM_QP_TOL loosens the f32 stop for
# product-rate operation (see calibrate_solver.py).
_TOLS = {
    jnp.dtype(jnp.float32): float(os.environ.get("SMPLSIM_QP_TOL", 1e-6)),
    jnp.dtype(jnp.float64): 1e-12,
}


def _tol_for(dtype) -> float:
    return _TOLS.get(jnp.dtype(dtype), 1e-6)


# ---------------------------------------------------------------------------
# reference implementation (single system) — the parity oracle
# ---------------------------------------------------------------------------
def newton_qp_reference(A, b, active, f0=None, iters: int = NEWTON_ITERS):
    """Projected Newton on one K-system (physics/solver.py newton loop)."""
    from smplsim_tpu.physics import linalg

    dtype = A.dtype
    K = A.shape[-1]
    steps = jnp.asarray(_LS_STEPS, dtype)
    tol = _tol_for(dtype) * (1.0 + jnp.max(jnp.abs(b)))

    def kkt(f):
        g = A @ f - b
        return jnp.max(jnp.abs(f - jnp.maximum(f - g, 0.0)) * active)

    def pg_step(f):
        g = A @ f - b
        d = jnp.where(((f > 0.0) | (g < 0.0)) & active, -g, 0.0)
        dAd = d @ (A @ d)
        alpha = jnp.where(dAd > 1e-30, (d @ d) / jnp.maximum(dAd, 1e-30), 0.0)
        return jnp.maximum(f + alpha * d, 0.0)

    def newton_iter(f):
        f = pg_step(f)
        g = A @ f - b
        act = ((f > 0.0) | (g < 0.0)) & active
        am = act.astype(dtype)
        H = A * am[:, None] * am[None, :] + jnp.diag(1.0 - am)
        chol = linalg.cholesky(H)
        f_newton = jnp.maximum(linalg.cho_solve(chol, b * am) * am, 0.0)
        d = f_newton - f
        cands = jnp.maximum(f[None, :] + steps[:, None] * d[None, :], 0.0)
        cands = jnp.concatenate([cands, f[None, :]], axis=0)
        vals = 0.5 * jnp.einsum("sk,kl,sl->s", cands, A, cands) - cands @ b
        w = jax.nn.one_hot(jnp.argmin(vals), cands.shape[0], dtype=dtype)
        return w @ cands

    if f0 is None:
        f0 = jnp.zeros(K, dtype=dtype)
    f0 = jnp.maximum(f0, 0.0) * active

    def cond(carry):
        i, f = carry
        return (i < iters) & (kkt(f) > tol)

    def body(carry):
        i, f = carry
        return i + 1, newton_iter(f)

    _, f = jax.lax.while_loop(cond, body, (jnp.int32(0), f0))
    return f


# ---------------------------------------------------------------------------
# the kernel: systems laid out (K, K, BB) / (K, BB), batch in lanes
# ---------------------------------------------------------------------------
def _qp_kernel(iters_ref, A_ref, b_ref, act_ref, f0_ref, f_ref, L_ref, y_ref,
               done_ref, *, K: int, tol: float):
    dtype = A_ref.dtype
    A = A_ref[:]          # (K, K, BB)
    b = b_ref[:]          # (K, BB)
    actb = act_ref[:] > 0.5
    actf = act_ref[:]

    row_i = jax.lax.broadcasted_iota(jnp.int32, (K, BB), 0)      # (K,BB)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (K, K, 1), 1)).astype(dtype)

    tol_lane = tol * (1.0 + jnp.max(jnp.abs(b), axis=0, keepdims=True))

    def matvec(M3, x):
        # (K,K,BB) x (K,BB) -> (K,BB): contract the middle axis per lane
        return jnp.sum(M3 * x[None, :, :], axis=1)

    def objective(f):
        return 0.5 * jnp.sum(f * matvec(A, f), axis=0, keepdims=True) - jnp.sum(
            b * f, axis=0, keepdims=True
        )

    def kkt_done(f):
        g = matvec(A, f) - b
        r = jnp.max(jnp.abs(f - jnp.maximum(f - g, 0.0)) * actf, axis=0,
                    keepdims=True)
        return jnp.all(r <= tol_lane)

    def row_at(c, j):
        # c (K,BB), scalar j -> (1,BB): masked reduce avoids value dyn-slice
        return jnp.sum(jnp.where(row_i == j, c, 0.0), axis=0, keepdims=True)

    def cholesky_inplace():
        """Factor L_ref (holds H on entry) in place."""

        def col(j, _):
            rowj = L_ref[pl.ds(j, 1), :, :][0]                   # (K,BB)
            rowj = jnp.where(row_i < j, rowj, 0.0)
            s = matvec(L_ref[:], rowj)
            colj = L_ref[:, pl.ds(j, 1), :][:, 0, :]
            c = colj - s
            pivot = jnp.sqrt(row_at(c, j))                       # (1,BB)
            newcol = jnp.where(
                row_i == j, pivot, jnp.where(row_i > j, c / pivot, 0.0)
            )
            L_ref[:, pl.ds(j, 1), :] = newcol[:, None, :]
            return 0

        jax.lax.fori_loop(0, K, col, 0)

    def cho_solve_inplace():
        """Solve L L^T x = y_ref in place (forward + back substitution)."""

        def fwd(j, _):
            colj = L_ref[:, pl.ds(j, 1), :][:, 0, :]
            piv = row_at(colj, j)
            yj = y_ref[pl.ds(j, 1), :] / piv
            y = y_ref[:]
            y_ref[:] = jnp.where(row_i > j, y - colj * yj, y)
            y_ref[pl.ds(j, 1), :] = yj
            return 0

        def bwd(t, _):
            j = K - 1 - t
            colj = L_ref[:, pl.ds(j, 1), :][:, 0, :]
            piv = row_at(colj, j)
            x = y_ref[:]
            s = jnp.sum(jnp.where(row_i > j, colj * x, 0.0), axis=0,
                        keepdims=True)
            y_ref[pl.ds(j, 1), :] = (y_ref[pl.ds(j, 1), :] - s) / piv
            return 0

        jax.lax.fori_loop(0, K, fwd, 0)
        jax.lax.fori_loop(0, K, bwd, 0)

    def pg_step(f):
        g = matvec(A, f) - b
        d = jnp.where(((f > 0.0) | (g < 0.0)) & actb, -g, 0.0)
        dAd = jnp.sum(d * matvec(A, d), axis=0, keepdims=True)
        dd = jnp.sum(d * d, axis=0, keepdims=True)
        alpha = jnp.where(dAd > 1e-30, dd / jnp.maximum(dAd, 1e-30), 0.0)
        return jnp.maximum(f + alpha * d, 0.0)

    def newton_iter():
        f = pg_step(f_ref[:])
        g = matvec(A, f) - b
        am = (((f > 0.0) | (g < 0.0)) & actb).astype(dtype)
        L_ref[:] = (
            A * am[None, :, :] * am[:, None, :] + eye * (1.0 - am)[None, :, :]
        )
        cholesky_inplace()
        y_ref[:] = b * am
        cho_solve_inplace()
        fn = jnp.maximum(y_ref[:] * am, 0.0)
        d = fn - f
        # projected-arc line search over the static step ladder (+ staying put)
        best_f = f
        best_v = objective(f)
        for s in _LS_STEPS:
            cand = jnp.maximum(f + s * d, 0.0)
            v = objective(cand)
            better = v < best_v
            best_f = jnp.where(better, cand, best_f)
            best_v = jnp.where(better, v, best_v)
        # all-lane KKT check keeps a converged block from burning the
        # remaining chunk iterations; the cross-chunk convergence control
        # lives at the XLA level (_newton_qp_chunked)
        f_ref[:] = best_f
        done_ref[0] = jnp.where(kkt_done(best_f), 1, 0)

    f0 = jnp.maximum(f0_ref[:], 0.0) * actf
    f_ref[:] = f0
    done_ref[0] = jnp.where(kkt_done(f0), 1, 0)

    def body(_, __):
        @pl.when(done_ref[0] == 0)
        def _run():
            newton_iter()
        return 0

    # iteration count is a RUNTIME scalar: a static count would specialize
    # the Mosaic kernel per chunk size (~200 s compile each on the axon TPU)
    jax.lax.fori_loop(0, iters_ref[0], body, 0)


def _newton_qp_pallas_lanes(At, bt, at, ft, iters=NEWTON_ITERS):
    """Lanes-native kernel entry: At (K,K,Bp), bt/at/ft (K,Bp), Bp a
    multiple of BB with inert padding lanes (identity A, zero active).
    Returns f_t (K,Bp). The substep spine calls this directly so the batch
    never leaves the lane dimension."""
    K, Bp = bt.shape
    dtype = At.dtype
    it = jnp.asarray(iters, jnp.int32).reshape(1)
    grid = (Bp // BB,)
    return pl.pallas_call(
        functools.partial(_qp_kernel, K=K, tol=_tol_for(dtype)),
        out_shape=jax.ShapeDtypeStruct((K, Bp), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((K, K, BB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, BB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((K, K, BB), dtype),
            pltpu.VMEM((K, BB), dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )(it, At, bt, at, ft)


@jax.jit
def _newton_qp_pallas(A, b, active, f0, iters=NEWTON_ITERS):
    """Batched solve: A (B,K,K), b (B,K), active (B,K), f0 (B,K) -> f (B,K).
    `iters` is a runtime scalar (traced), so all chunk sizes share ONE
    compiled Mosaic kernel."""
    Bn, K = b.shape
    dtype = A.dtype
    pad = (-Bn) % BB
    if pad:
        A = jnp.concatenate(
            [A, jnp.tile(jnp.eye(K, dtype=dtype)[None], (pad, 1, 1))], axis=0
        )
        b = jnp.concatenate([b, jnp.zeros((pad, K), dtype)], axis=0)
        active = jnp.concatenate([active, jnp.zeros((pad, K), bool)], axis=0)
        f0 = jnp.concatenate([f0, jnp.zeros((pad, K), dtype)], axis=0)

    # batch -> lanes
    At = jnp.transpose(A, (1, 2, 0))          # (K,K,Bp)
    bt = jnp.transpose(b, (1, 0))             # (K,Bp)
    at = jnp.transpose(active.astype(dtype), (1, 0))
    ft = jnp.transpose(f0, (1, 0))
    f_t = _newton_qp_pallas_lanes(At, bt, at, ft, iters)
    return jnp.transpose(f_t, (1, 0))[:Bn]


def newton_qp_twophase_lanes(At, bt, at, ft, iters: int = NEWTON_ITERS):
    """Lanes QP batch solve with SORTED-lane compaction (r5).

    The kernel's early exit is per-128-lane block: one unconverged lane
    keeps its whole block iterating, and at 450 Hz warm starts most lanes
    converge in 1-3 Newton iterations while a few cold/contact-switching
    lanes need the full budget. Sorting lanes by the warm-start KKT
    residual clusters the easy lanes into blocks that exit after one
    iteration and concentrates the hard lanes into a few blocks that run
    deep — every lane gets the FULL iteration budget (the old two-phase
    straggler budget silently froze over-budget envs at phase-1 forces;
    sorting removes that failure mode entirely). The permutation moves
    (K,K,B) ~17 MB — noise next to one saved block-iteration sweep.

    At (K,K,Bp), bt/at/ft (K,Bp) with inert padding lanes. Returns (K,Bp).
    """
    K, Bp = bt.shape
    dtype = At.dtype
    if Bp < 2 * BB:
        return _newton_qp_pallas_lanes(At, bt, at, ft, iters=iters)
    # warm-start KKT residual per lane (padding lanes: b=0, act=0 -> r=0)
    g = jnp.sum(At * ft[None, :, :], axis=1) - bt                      # (K,Bp)
    r0 = jnp.max(jnp.abs(ft - jnp.maximum(ft - g, 0.0)) * at, axis=0)  # (Bp,)
    perm = jnp.argsort(-r0)                                            # hard first
    inv = jnp.argsort(perm)
    # 2-D gather (the TPU backend lowers >2-D gathers poorly / not at all)
    A2d = jnp.transpose(At, (2, 0, 1)).reshape(Bp, K * K)
    A_s = jnp.transpose(A2d[perm].reshape(Bp, K, K), (1, 2, 0))
    f_s = _newton_qp_pallas_lanes(
        A_s, bt[:, perm], at[:, perm], ft[:, perm], iters=iters)
    return f_s[:, inv]


_CHUNK0 = min(12, NEWTON_ITERS)  # first kernel call: the common convergence depth
_CHUNK = 8    # straggler chunks afterwards, up to the iteration cap

# Two-phase straggler compaction (the TPU batch path): warm-started substeps
# converge in 1-3 Newton iterations for almost every env, but the kernel's
# early exit is per-128-lane-block — one slow env keeps its whole block
# iterating. Phase 1 runs PHASE1 iterations on everyone; the B/STRAGGLER_DIV
# envs with the worst KKT residuals are then gathered into a compact batch
# for the remaining iterations and scattered back. Envs beyond the straggler
# budget keep their phase-1 forces (surfaced by the solver's `stalled`
# telemetry; bench runs show ~0 at the calibrated operating point).
_PHASE1 = int(os.environ.get("SMPLSIM_QP_PHASE1", 6))
_STRAGGLER_DIV = int(os.environ.get("SMPLSIM_QP_STRAGGLER_DIV", 8))


def _newton_qp_twophase(A, b, active, f0, iters: int = NEWTON_ITERS):
    """Phase-1 on the full batch, remaining iterations on the worst envs."""
    Bn = b.shape[0]
    if iters <= _PHASE1 or Bn < 2 * BB:
        return _newton_qp_pallas(A, b, active, f0, iters=iters)
    f1 = _newton_qp_pallas(A, b, active, f0, iters=_PHASE1)
    dtype = A.dtype
    tol = _tol_for(dtype) * (1.0 + jnp.max(jnp.abs(b), axis=-1))   # (B,)
    g = jnp.einsum("bij,bj->bi", A, f1) - b
    r = jnp.max(jnp.abs(f1 - jnp.maximum(f1 - g, 0.0))
                * active.astype(dtype), axis=-1)
    # straggler budget, rounded up to a lane block but never beyond the batch
    # (top_k with k > Bn is invalid; Bn >= 2*BB here, and _newton_qp_pallas
    # pads non-multiple-of-BB gathers internally)
    k = min(Bn, max(BB, (Bn // _STRAGGLER_DIV + BB - 1) // BB * BB))
    _, idx = jax.lax.top_k(jnp.where(r > tol, r, -1.0), k)
    f2 = _newton_qp_pallas(
        A[idx], b[idx], active[idx], f1[idx], iters=iters - _PHASE1
    )
    return f1.at[idx].set(f2)


def _newton_qp_chunked(A, b, active, f0, iters: int = NEWTON_ITERS):
    """Chunked adaptive solve: run the kernel _CHUNK iterations at a time
    inside an XLA while_loop, stopping once EVERY system satisfies the KKT
    tolerance or stops moving.

    Why not a single long kernel call: a block of 128 lanes exits only when
    all its lanes converge, and with the cap at 40 a handful of
    f32-stalled lanes made every substep pay 40 iterations. Here the
    convergence test is per-BATCH (one cheap batched matvec between
    chunks); typical warm-started substeps finish in 1-2 chunks and only
    cold contact-rich batches run deep. The extra HBM traffic per chunk
    (re-reading A) is ~16 MB at B=1024 — noise next to the VMEM work.
    """
    dtype = A.dtype
    tol = _tol_for(dtype) * (1.0 + jnp.max(jnp.abs(b), axis=-1))  # (B,)
    actf = active.astype(dtype)

    def kkt_ok(f):
        g = jnp.einsum("bij,bj->bi", A, f) - b
        r = jnp.max(jnp.abs(f - jnp.maximum(f - g, 0.0)) * actf, axis=-1)
        return r <= tol

    def cond(carry):
        i, f, done = carry
        return (i < iters) & ~done

    def body(carry):
        i, f, _ = carry
        f_new = _newton_qp_pallas(A, b, active, f, iters=_CHUNK)
        # movement floor at 1e-4 relative: f32 line-search jitter sits above
        # 1e-6 of the force scale, which kept stalled systems "moving" and
        # every chunk running to the 40-iteration cap
        moved = jnp.any(
            jnp.abs(f_new - f) > 1e-4 * (1.0 + jnp.abs(f)), axis=(-1,)
        )
        done = jnp.all(kkt_ok(f_new) | ~moved)
        return i + _CHUNK, f_new, done

    f1 = _newton_qp_pallas(A, b, active, f0, iters=_CHUNK0)
    done0 = jnp.all(kkt_ok(f1))
    _, f, _ = jax.lax.while_loop(cond, body, (jnp.int32(_CHUNK0), f1, done0))
    return f


def _newton_qp_batched(A, b, active, f0, iters: int = NEWTON_ITERS):
    """Batch dispatch: Pallas kernel on TPU, vmapped reference elsewhere."""
    ref = jax.vmap(lambda a, x, m, w: newton_qp_reference(a, x, m, w, iters))

    if A.dtype not in (jnp.float32,):
        return ref(A, b, active, f0)

    return jax.lax.platform_dependent(
        A, b, active, f0,
        tpu=lambda a, x, m, w: _newton_qp_twophase(a, x, m, w, iters=iters),
        default=ref,
    )


@jax.custom_batching.custom_vmap
def _newton_qp_vmappable(A, b, active, f0):
    return newton_qp_reference(A, b, active, f0, NEWTON_ITERS)


@jax.custom_jvp
def newton_qp(A, b, active, f0=None):
    """Solve min 1/2 f^T A f - b^T f, f >= 0 (one system; vmap for batches —
    batched calls fuse into one TPU kernel). f0 optionally warm-starts the
    iteration (the previous substep's forces); the solution of the strictly
    convex QP is unique, so f0 affects iteration count, not the answer.

    Differentiation uses the implicit-function theorem at the converged
    active set (iLQR jacfwds through the physics step), not the unrolled
    iterations: on S = {i : f_i > 0}, A_SS f_S = b_S, so
    df_S = A_SS^{-1} (db_S - dA_S f)."""
    if f0 is None:
        f0 = jnp.zeros_like(b)
    return _newton_qp_vmappable(A, b, active, f0)


@newton_qp.defjvp
def _newton_qp_jvp(primals, tangents):
    from smplsim_tpu.physics import linalg

    A, b, active, *rest = primals
    dA, db = tangents[0], tangents[1]
    f0 = rest[0] if rest else None
    if f0 is None:
        f0 = jnp.zeros_like(b)
    f = _newton_qp_vmappable(A, b, active, f0)
    am = ((f > 0.0) & active).astype(A.dtype)
    H = A * am[..., :, None] * am[..., None, :] + jnp.diag(1.0 - am)
    dA = jnp.zeros_like(A) if isinstance(dA, jax.custom_derivatives.SymbolicZero) else dA
    db = jnp.zeros_like(b) if isinstance(db, jax.custom_derivatives.SymbolicZero) else db
    rhs = (db - dA @ f) * am
    df = linalg.cho_solve(linalg.cholesky(H), rhs) * am
    return f, df


@_newton_qp_vmappable.def_vmap
def _newton_qp_vmap(axis_size, in_batched, A, b, active, f0):
    A_b, b_b, act_b, f0_b = in_batched
    # normalize: all inputs batched on axis 0
    A = A if A_b else jnp.broadcast_to(A[None], (axis_size,) + A.shape)
    b = b if b_b else jnp.broadcast_to(b[None], (axis_size,) + b.shape)
    active = active if act_b else jnp.broadcast_to(
        active[None], (axis_size,) + active.shape
    )
    f0 = f0 if f0_b else jnp.broadcast_to(f0[None], (axis_size,) + f0.shape)
    return _newton_qp_batched(A, b, active, f0), True
