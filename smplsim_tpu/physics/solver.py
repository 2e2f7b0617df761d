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


class ConstraintSolution(NamedTuple):
    qacc: jax.Array       # (nv,)
    efc_force: jax.Array  # (nefc,)
    qfrc_constraint: jax.Array  # (nv,)


def solve_constraints(model: RobotModel, smooth: Smooth, efc: EFC) -> ConstraintSolution:
    nefc = efc.J.shape[0]
    dtype = efc.J.dtype

    # Delassus operator A = J M^-1 J^T (+R on the diagonal)
    MiJt = jax.scipy.linalg.cho_solve((smooth.chol, True), efc.J.T)  # (nv,nefc)
    A = efc.J @ MiJt + jnp.diag(efc.R)
    b = efc.aref - efc.J @ smooth.qacc_smooth
    b = jnp.where(efc.active, b, 0.0)

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
        d = jnp.where(((f > 0.0) | (g < 0.0)) & efc.active, -g, 0.0)
        dAd = d @ (A @ d)
        alpha = jnp.where(dAd > 1e-30, (d @ d) / jnp.maximum(dAd, 1e-30), 0.0)
        return jnp.maximum(f + alpha * d, 0.0)

    def newton_iter(f, _):
        f = pg_step(f)
        g = A @ f - b
        act = ((f > 0.0) | (g < 0.0)) & efc.active
        am = act.astype(dtype)
        H = A * am[:, None] * am[None, :] + jnp.diag(1.0 - am)
        # H is SPD on the active set (A is PSD + R > 0)
        chol = jnp.linalg.cholesky(H)
        f_newton = jnp.maximum(jax.scipy.linalg.cho_solve((chol, True), b * am) * am, 0.0)
        d = f_newton - f
        cands = jnp.maximum(f[None, :] + steps[:, None] * d[None, :], 0.0)
        vals = jax.vmap(objective)(cands)
        vals = jnp.concatenate([vals, objective(f)[None]])
        cands = jnp.concatenate([cands, f[None, :]], axis=0)
        return cands[jnp.argmin(vals)], None

    f0 = jnp.zeros(nefc, dtype=dtype)
    f, _ = jax.lax.scan(newton_iter, f0, None, length=NEWTON_ITERS)

    qfrc = efc.J.T @ f
    qacc = smooth.qacc_smooth + MiJt @ f
    return ConstraintSolution(qacc=qacc, efc_force=f, qfrc_constraint=qfrc)
