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
from smplsim_tpu.physics import linalg
from smplsim_tpu.physics.constraints import EFC
from smplsim_tpu.physics.dynamics import Smooth
from smplsim_tpu.ops.qp_kernel import newton_qp

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
    MiJt = linalg.cho_solve(smooth.chol, J_c.T)  # (nv,K)
    A = J_c @ MiJt + jnp.diag(R_c)
    b = aref_c - J_c @ smooth.qacc_smooth
    b = jnp.where(active, b, 0.0)

    # projected Newton with projected-arc line search (algorithm + parity
    # notes in ops/qp_kernel.newton_qp_reference; batched env calls fuse into
    # the Pallas TPU kernel via newton_qp's custom_vmap)
    f = newton_qp(A, b, active)

    qfrc = J_c.T @ f
    qacc = smooth.qacc_smooth + MiJt @ f
    # scatter compact forces back to the full row layout
    efc_force = jnp.zeros(nefc, dtype=dtype).at[sel].set(f)
    return ConstraintSolution(qacc=qacc, efc_force=efc_force, qfrc_constraint=qfrc)
