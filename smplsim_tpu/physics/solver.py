"""Constraint-force solver: projected Newton on the regularized dual QP.

MuJoCo computes constraint forces by optimizing a convex objective; with
pyramidal cones the dual is a box-constrained QP:

    min_{f >= 0}  1/2 f^T (A + R) f - f^T (aref - J qacc_smooth)
    A = J M^-1 J^T

We solve it with a fixed number of projected-Newton iterations (active-set
guesses + masked Cholesky solves) — fully batched, jit-compatible, no dynamic
shapes. Accuracy is validated against MuJoCo's Newton solver in
tests/test_contact_parity.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smplsim_tpu.models.spec import RobotModel
from smplsim_tpu.physics.constraints import EFC
from smplsim_tpu.physics.dynamics import Smooth

NEWTON_ITERS = 12

# compact active system size: rows beyond the K deepest-active are dropped
# (the humanoid rarely exceeds ~40 simultaneously active rows; all parity
# tests operate well under K)
COMPACT_ROWS = 64


class ConstraintSolution(NamedTuple):
    qacc: jax.Array       # (nv,)
    efc_force: jax.Array  # (nefc,)
    qfrc_constraint: jax.Array  # (nv,)


def solve_constraints(model: RobotModel, smooth: Smooth, efc: EFC) -> ConstraintSolution:
    """Constraint forces via the compact active subsystem.

    The full EFC carries nefc fixed-shape rows, mostly inactive; the dense
    dual solve is O(nefc^3)-ish in the Newton loop. Gathering the (at most
    COMPACT_ROWS) active rows first cuts the Newton-loop linear algebra by
    (nefc/K)^3 with identical results whenever #active <= K.
    """
    nefc = efc.J.shape[0]
    dtype = efc.J.dtype
    K = min(COMPACT_ROWS, nefc)

    # stable top-k on the activity flag keeps active rows in original order
    _, sel = jax.lax.top_k(efc.active.astype(dtype), K)
    J_c = efc.J[sel]                    # (K, nv)
    R_c = efc.R[sel]
    aref_c = efc.aref[sel]
    active = efc.active[sel]

    # Delassus operator A = J M^-1 J^T (+R on the diagonal)
    MiJt = jax.scipy.linalg.cho_solve((smooth.chol, True), J_c.T)  # (nv,K)
    A = J_c @ MiJt + jnp.diag(R_c)
    b = aref_c - J_c @ smooth.qacc_smooth
    b = jnp.where(active, b, 0.0)

    # projected Newton with a projected-arc line search: the masked Newton
    # solve proposes an active-set step; we evaluate the objective at a
    # geometric ladder of step sizes (in parallel) and keep the best projected
    # point. Monotone descent => no active-set cycling (plain projected
    # Newton oscillates on degenerate contact sets, e.g. 16 coplanar corners).
    steps = jnp.asarray([1.0, 0.5, 0.25, 0.0625, 0.015625], dtype=dtype)

    def objective(f):
        return 0.5 * f @ (A @ f) - b @ f

    def pg_step(f):
        # exact-line-search projected gradient: escapes active-set stalls
        # (a bound row with g<0 gets a first-order push that the masked
        # Newton solve cannot give it — Bertsekas two-metric projection)
        g = A @ f - b
        d = jnp.where(((f > 0.0) | (g < 0.0)) & active, -g, 0.0)
        dAd = d @ (A @ d)
        alpha = jnp.where(dAd > 1e-30, (d @ d) / jnp.maximum(dAd, 1e-30), 0.0)
        return jnp.maximum(f + alpha * d, 0.0)

    def newton_iter(f, _):
        f = pg_step(f)
        g = A @ f - b
        act = ((f > 0.0) | (g < 0.0)) & active
        am = act.astype(dtype)
        H = A * am[:, None] * am[None, :] + jnp.diag(1.0 - am)
        # H is SPD on the active set (A is PSD + R > 0)
        chol = jnp.linalg.cholesky(H)
        f_newton = jnp.maximum(jax.scipy.linalg.cho_solve((chol, True), b * am) * am, 0.0)
        d = f_newton - f
        cands = jnp.maximum(f[None, :] + steps[:, None] * d[None, :], 0.0)
        cands = jnp.concatenate([cands, f[None, :]], axis=0)
        vals = 0.5 * jnp.einsum("sk,kl,sl->s", cands, A, cands) - cands @ b
        # one-hot argmin select: a dynamic-index gather here becomes a
        # batched gather under vmap, which is catastrophically slow on TPU
        w = jax.nn.one_hot(jnp.argmin(vals), cands.shape[0], dtype=dtype)
        return w @ cands, None

    f0 = jnp.zeros(K, dtype=dtype)
    f, _ = jax.lax.scan(newton_iter, f0, None, length=NEWTON_ITERS)

    qfrc = J_c.T @ f
    qacc = smooth.qacc_smooth + MiJt @ f
    # scatter compact forces back to the full row layout
    efc_force = jnp.zeros(nefc, dtype=dtype).at[sel].set(f)
    return ConstraintSolution(qacc=qacc, efc_force=efc_force, qfrc_constraint=qfrc)
