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
from smplsim_tpu.ops.qp_kernel import NEWTON_ITERS, newton_qp

# compact active system size: rows beyond the K deepest-active are dropped
# (the humanoid rarely exceeds ~40 simultaneously active rows; all parity
# tests operate well under K). SMPLSIM_QP_ROWS overrides for product-rate
# operation — the QP kernel's factorization work scales ~K^3 and the speed
# task runs ~16-28 active rows, so K=32 halves-to-quarters the solve. The
# `overflow` flag (env info / PPO efc_overflow_frac) audits the truncation.
import os as _os

COMPACT_ROWS = int(_os.environ.get("SMPLSIM_QP_ROWS", 64))


class ConstraintSolution(NamedTuple):
    qacc: jax.Array       # (nv,)
    efc_force: jax.Array  # (nefc,)
    qfrc_constraint: jax.Array  # (nv,)
    nactive: jax.Array    # () int32: EFC rows active this substep
    overflow: jax.Array   # () bool: nactive > COMPACT_ROWS (forces truncated)
    # () bool: the returned forces do NOT meet the KKT tolerance — the solver
    # hit its iteration cap or the chunked early-exit's movement floor
    # (ADVICE r2: f32-stalled lanes used to truncate convergence silently)
    stalled: jax.Array


def solve_constraints(
    model: RobotModel, kin, smooth: Smooth, efc: EFC,
    f_warm: jax.Array | None = None
) -> ConstraintSolution:
    """Constraint forces via the compact active subsystem.

    The full EFC carries nefc fixed-shape rows, mostly inactive; the dense
    dual solve is O(nefc^3)-ish in the Newton loop. Gathering the (at most
    COMPACT_ROWS) active rows first cuts the Newton-loop linear algebra by
    (nefc/K)^3 with identical results whenever #active <= K. `nactive` /
    `overflow` report when that assumption breaks (contact pile-ups beyond
    K rows silently lose the shallowest rows; tests/test_getup_parity.py
    asserts the getup regime stays under K).

    `f_warm` is the previous substep's efc_force in the FULL row layout.
    Row slots are assigned deepest-first by make_efc's top_k selections,
    which are stable between 450 Hz substeps except when contacts reorder;
    a mismatched slot only degrades the warm start (more Newton iterations
    that substep), never the answer — the QP minimizer is unique BECAUSE
    every active row carries R > 0 (make_efc floors active-row R at 1e-10,
    matching MuJoCo's mj_makeImpedance positivity), which makes A + diag(R)
    strictly positive definite on the active set.
    """
    nefc = efc.active.shape[0]
    dtype = efc.l_J.dtype
    nv = efc.l_J.shape[1]
    L = efc.l_J.shape[0]
    K = min(COMPACT_ROWS, nefc)

    # stable top-k on the activity flag keeps active rows in original order
    # (rank-based selection, no sort/scan; see constraints.top_k_onehot).
    # Row gather/scatter as one-hot matmuls: batched gathers with dynamic
    # indices serialize on TPU, (K,nefc)x(nefc,nv) rides the MXU
    from smplsim_tpu.physics.constraints import top_k_onehot
    from smplsim_tpu.physics.topology import tree_masks

    _, onehot = top_k_onehot(efc.active.astype(dtype), K)  # (K,nefc)
    active = (onehot @ efc.active.astype(dtype)) > 0.5

    # row-spec gathers (all (nefc,)-sized vectors — cheap)
    aref_all = jnp.concatenate([efc.l_aref, efc.aref.reshape(-1)])
    R_all = jnp.concatenate([efc.l_R, efc.R.reshape(-1)])
    R_c = onehot @ R_all
    aref_c = onehot @ aref_all

    # jacobians ONLY for the K selected rows: J = (W6 @ S^T) * relmask for
    # contact rows (+ the dense limit rows, which are K x L tiny). Rows
    # gathered from the limit region have W6 = 0, so a bogus body index
    # there contributes nothing.
    oh_con = onehot[:, L:]                                  # (K, 4C)
    W6_c = oh_con @ efc.W6.reshape(-1, 6)                   # (K, 6)
    row_b1 = jnp.repeat(efc.body1, 4).astype(dtype)
    row_b2 = jnp.repeat(efc.body2, 4).astype(dtype)
    b1_c = oh_con @ row_b1
    b2_c = oh_con @ row_b2
    masks = tree_masks(model.parents)
    body_dof = jnp.asarray(masks["body_dof"], dtype)        # (J, nv)
    nbody = body_dof.shape[0]
    barange = jnp.arange(nbody, dtype=dtype)[None, :]
    b1_oh = ((jnp.abs(b1_c[:, None] - barange) < 0.5)
             & (b1_c[:, None] > -0.5)).astype(dtype)        # (K, J)
    b2_oh = ((jnp.abs(b2_c[:, None] - barange) < 0.5)
             & (b2_c[:, None] > -0.5)).astype(dtype)
    relmask = (b2_oh - b1_oh) @ body_dof                    # (K, nv)
    J_c = (W6_c @ kin.S.T) * relmask + onehot[:, :L] @ efc.l_J
    J_c = J_c * active[:, None]

    # Delassus operator A = J M^-1 J^T (+R on the diagonal), in Gram form:
    # Y = L^-1 J^T (ONE triangular pass over K rhs), A = Y^T Y — half the
    # solve traffic of cho_solve and an MXU matmul for the product
    Y = linalg.tri_solve_lower(smooth.chol, J_c.T)  # (nv,K)
    A = Y.T @ Y + jnp.diag(R_c)
    b = aref_c - J_c @ smooth.qacc_smooth
    b = jnp.where(active, b, 0.0)

    # projected Newton with projected-arc line search (algorithm + parity
    # notes in ops/qp_kernel.newton_qp_reference; batched env calls fuse into
    # the Pallas TPU kernel via newton_qp's custom_vmap). Warm-started from
    # the previous substep's forces gathered into the fresh row selection.
    f0 = None if f_warm is None else onehot @ f_warm
    f = newton_qp(A, b, active, f0)

    qfrc = J_c.T @ f
    qacc = smooth.qacc_smooth + linalg.cho_solve(smooth.chol, qfrc)
    # scatter compact forces back to the full row layout
    efc_force = onehot.T @ f
    nactive = jnp.sum(efc.active, dtype=jnp.int32)
    # convergence audit: one extra matvec surfaces solves truncated by the
    # iteration cap / chunked movement floor (telemetry, not control flow)
    from smplsim_tpu.ops.qp_kernel import _tol_for

    g = A @ f - b
    kkt = jnp.max(jnp.abs(f - jnp.maximum(f - g, 0.0)) * active)
    stalled = kkt > _tol_for(dtype) * (1.0 + jnp.max(jnp.abs(b)))
    return ConstraintSolution(
        qacc=qacc, efc_force=efc_force, qfrc_constraint=qfrc,
        nactive=nactive, overflow=nactive > K, stalled=stalled,
    )
