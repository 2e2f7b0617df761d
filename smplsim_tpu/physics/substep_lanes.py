"""The batched uhc_pd control step, lanes-last end-to-end.

Round-5 restructuring: the floor-level ablation (BENCH_BREAKDOWN_r05) showed
45% of the substep in the dense-linalg chain — almost all of it LAYOUT
traffic, not math: every custom_vmap op boundary shipped the (75,75,B) mass
matrix between batch-major and lanes-last layouts, and every batch-major
kernel wrapper (ops/linalg_kernels) transposed it again. The true compute
skeleton (FK + integrate + PD targets) measured 0.13 ms/substep at B=4096.

This module runs the WHOLE 15-substep control loop with the env batch in
the lane dimension, touching batch-major layout exactly twice per control
step (the op boundary). The dense solves go through lanes-native fused
kernels that never materialize a factor in HBM:

  * stable-PD: H = M_prev + dt*diag(kd) assembled IN the kernel, factored
    and solved in one VMEM residency (ops/linalg_kernels.chol_solve_lanes).
  * smooth dynamics + Delassus: ONE kernel factors M and solves the
    (1 + K)-column rhs [qfrc | J^T] -> qacc_smooth and W = M^-1 J^T; the
    QP system A = J W + diag(R) and the post-QP correction qacc += W f are
    lanes reductions, so no cho_solve ever re-reads a factor from HBM.
  * contact QP: ops/qp_kernel.newton_qp_twophase_lanes (the existing
    Mosaic kernel, fed lanes directly — no (B,K,K) transposes).

EFC assembly reuses the per-env reference code (physics/constraints.py)
under a TRAILING-axis vmap: with the batch as every intermediate's minor
dimension the scalar contact math is lane-parallel for free, and the
self-collision custom_vmap dispatches to its lanes pipeline as usual. The
compact active-row selection is reimplemented here with a cumsum rank (the
per-env path's (nefc,nefc) pairwise ranking is exactly prefix-counting when
the score is a 0/1 activity flag) and virtual one-hot reductions that XLA
fuses without materializing (K,nefc,B).

Semantics: identical to engine.control_step's per-env reference loop —
tests/test_substep_lanes.py pins vmap(control_step) against a python loop
of per-env calls. Reference behavior cited in engine.control_step
(smpl_sim/envs/humanoid_env.py:439-453 physics_step; controllers.py:142-190
stable-PD lifecycle).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from smplsim_tpu.physics import aba as aba_mod
from smplsim_tpu.physics import constraints, dynamics_lanes, fk_lanes, integrator
from smplsim_tpu.physics import linalg
from smplsim_tpu.physics.kinematics import Kin
from smplsim_tpu.physics.topology import tree_masks

_BB = 128


def _aba_enabled(dtype) -> bool:
    """Articulated-body (O(tree-depth)) solves replace the dense 75x75
    Cholesky chain on the f32 product path (physics/aba.py rationale).
    f64 keeps the dense factorization so the 1e-9 lanes-vs-reference parity
    pins stay exact; SMPLSIM_ABA=0 restores the dense path for A/B runs."""
    return dtype == jnp.float32 and \
        os.environ.get("SMPLSIM_ABA", "1") not in ("0", "false", "off")


def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def _lane(x, nd):
    """Trailing lane axis for an unbatched (shared) model field."""
    return x if x.ndim == nd + 1 else x[..., None]


def _pad_spd(Mt, np_):
    """(n,n,B) -> (np,np,B) with identity padding (keeps SPD)."""
    n = Mt.shape[0]
    if n == np_:
        return Mt
    B = Mt.shape[-1]
    pad = jnp.zeros((np_, np_, B), Mt.dtype)
    pad = pad.at[:n, :n, :].set(Mt)
    idx = jnp.arange(n, np_)
    return pad.at[idx, idx, :].set(1.0)


def _chol_solve_dispatch(Mt, bt, diag_t=None):
    """Fused factor+solve in lanes: Pallas on f32 TPU, plain-lanes fallback
    elsewhere (CPU tests / f64 / the multichip dryrun). Mt (n,n,B) SPD
    already padded to 8-multiples; bt (n,m,B); diag_t (n,B) optional."""
    def fallback(Mt, bt, diag_t):
        A = jnp.moveaxis(Mt, -1, 0)
        if diag_t is not None:
            d = jnp.moveaxis(diag_t, -1, 0)
            A = A + jax.vmap(jnp.diag)(d)
        b = jnp.moveaxis(bt, -1, 0)
        L = jax.vmap(linalg._cholesky_ref)(A)
        x = jax.vmap(linalg._cho_solve_ref)(L, b)
        return jnp.moveaxis(x, 0, -1)

    if Mt.dtype != jnp.float32:
        return fallback(Mt, bt, diag_t)
    from smplsim_tpu.ops import linalg_kernels as lk

    m = bt.shape[1]
    mp = max(_pad8(m) if m > 1 else 1, 1)
    if mp != m:
        bt = jnp.pad(bt, ((0, 0), (0, mp - m), (0, 0)))
    if diag_t is None:
        return jax.lax.platform_dependent(
            Mt, bt, tpu=lambda M, b: lk.chol_solve_lanes(M, b),
            default=lambda M, b: fallback(M, b, None),
        )[:, :m, :]
    return jax.lax.platform_dependent(
        Mt, bt, diag_t,
        tpu=lambda M, b, d: lk.chol_solve_lanes(M, b, d),
        default=fallback,
    )[:, :m, :]


def _qp_dispatch(At, bt, at, ft, iters):
    """Contact-QP in lanes; Pallas twophase on f32 TPU, reference elsewhere.
    At (K,K,B), bt/at/ft (K,B) with B a multiple of 128 (padding lanes must
    be inert: identity A, zero active)."""
    from smplsim_tpu.ops import qp_kernel as qk

    def fallback(At, bt, at, ft):
        A = jnp.moveaxis(At, -1, 0)
        ref = jax.vmap(
            lambda a, b, m, w: qk.newton_qp_reference(a, b, m > 0.5, w, iters)
        )
        f = ref(A, jnp.moveaxis(bt, -1, 0), jnp.moveaxis(at, -1, 0),
                jnp.moveaxis(ft, -1, 0))
        return jnp.moveaxis(f, 0, -1)

    if At.dtype != jnp.float32:
        return fallback(At, bt, at, ft)
    return jax.lax.platform_dependent(
        At, bt, at, ft,
        tpu=lambda A, b, a, f: qk.newton_qp_twophase_lanes(A, b, a, f, iters),
        default=fallback,
    )


# ---------------------------------------------------------------------------
# mass-matrix solve closures: dense padded matrix vs articulated-body tree
# ---------------------------------------------------------------------------
def _dense_solver(MpT, nv):
    """solve(rhs (nv,m,B), diag (nv,B)|None) -> (nv,m,B) against the PADDED
    (np,np,B) matrix MpT (armature already inside M; diag adds on top)."""
    np_ = MpT.shape[0]

    def solve(rhs, diag=None):
        m, B = rhs.shape[1], rhs.shape[-1]
        rhs_p = jnp.zeros((np_, m, B), MpT.dtype).at[:nv].set(rhs)
        diag_p = None if diag is None else \
            jnp.zeros((np_, B), MpT.dtype).at[:nv].set(diag)
        return _chol_solve_dispatch(MpT, rhs_p, diag_p)[:nv]

    return solve


def _aba_solver(model, kin):
    """solve(rhs (nv,m,B), diag) -> (M(kin) + armature + diag)^-1 rhs via the
    O(tree-depth) two-sweep factorization (physics/aba.py), vmapped with the
    env batch in the trailing lane axis. Exact (to rounding) match of the
    dense CRBA solve — tests/test_aba.py pins it; never factors or even
    forms the (nv,nv) matrix."""
    parents = model.parents
    dtype = kin.S.dtype
    arm = jnp.asarray(model.armature, dtype)
    bm = jnp.asarray(model.body_mass, dtype)

    def solve(rhs, diag=None):
        nv, _, B = rhs.shape
        d = jnp.broadcast_to(_lane(arm, 1), (nv, B))
        if diag is not None:
            d = d + diag
        bmB = jnp.broadcast_to(_lane(bm, 1), bm.shape[:1] + (B,))
        f = jax.vmap(
            lambda S, com, Iw, xp, m_, dd, r: aba_mod.mass_solve(
                parents, S, com, Iw, xp, m_, dd, r),
            in_axes=-1, out_axes=-1,
        )
        return f(kin.S, kin.com, kin.inertia_w, kin.xpos, bmB, d, rhs)

    return solve


# ---------------------------------------------------------------------------
# stable-PD, lanes (controllers.py:142-190 law; see control.stable_pd_torque)
# ---------------------------------------------------------------------------
def stable_pd_lanes(model, Msolve, C_prev, qT, vT, targetT):
    """Msolve: PADDED (np,np,B) previous-substep mass matrix, or a solve
    closure (from _aba_solver over the previous substep's kinematics —
    armature handled inside). C_prev (nv,B); qT (nq,B); vT (nv,B);
    targetT (nu,B). Returns tau (nu,B)."""
    dtype = vT.dtype
    B = vT.shape[-1]
    nv = vT.shape[0]
    if not callable(Msolve):
        Msolve = _dense_solver(Msolve, nv)
    dt = _lane(model.timestep, 0)                      # (B,) or (1,)
    z6 = jnp.zeros((6, B), dtype)
    jkp = jnp.broadcast_to(_lane(model.jkp, 1), (nv - 6, B))
    jkd = jnp.broadcast_to(_lane(model.jkd, 1), (nv - 6, B))
    kp = jnp.concatenate([z6, jkp], axis=0)
    kd = jnp.concatenate([z6, jkd], axis=0)
    qpos_err = jnp.concatenate([z6, qT[7:] + vT[6:] * dt[None] - targetT],
                               axis=0)
    rhs = -C_prev - kp * qpos_err - kd * vT            # (nv,B)
    qacc = Msolve(rhs[:, None, :], kd * dt[None])[:, 0, :]
    lim = jnp.broadcast_to(_lane(model.torque_lim, 1), (nv - 6, B))
    tau = -jkp * qpos_err[6:] - jkd * (vT[6:] + qacc[6:] * dt[None])
    return jnp.clip(tau, -lim, lim)


# ---------------------------------------------------------------------------
# compact active-row solve, lanes (solver.solve_constraints semantics)
# ---------------------------------------------------------------------------
def _slot_rank(af):
    """Compact-slot index per EFC row, matching top_k_onehot on a 0/1 flag:
    actives keep original order (rank = #actives before), inactives fill the
    remaining slots in index order. af (nefc,B) float 0/1 -> (nefc,B)."""
    r_act = jnp.cumsum(af, axis=0) - af
    inaf = 1.0 - af
    r_in = jnp.cumsum(inaf, axis=0) - inaf
    nact = jnp.sum(af, axis=0, keepdims=True)
    return jnp.where(af > 0.5, r_act, nact + r_in)


def solve_constraints_lanes(model, S, Msolve, qfrc, efc, f_warm, iters, K):
    """Lanes twin of solver.solve_constraints fused with the smooth solve.

    S (nv,6,B) dof subspaces; Msolve: padded (np,np,B) mass matrix or a
    solve closure (_aba_solver); qfrc (nv,B) smooth force; efc: EFC pytree
    with TRAILING lane axes (from the trailing-vmap of make_efc);
    f_warm (nefc,B).

    Returns (qacc (nv,B), efc_force (nefc,B), nactive (B,), overflow (B,),
    stalled (B,), qacc_smooth (nv,B)).
    """
    dtype = S.dtype
    nv, _, B = S.shape
    if not callable(Msolve):
        Msolve = _dense_solver(Msolve, nv)
    nefc = efc.active.shape[0]
    L = efc.l_J.shape[0]
    C = efc.W6.shape[0]

    af = efc.active.astype(dtype)                      # (nefc,B)
    slot = _slot_rank(af)                              # (nefc,B)
    ks = jnp.arange(K, dtype=dtype)

    def sel(x):
        """(nefc,B) -> (K,B) virtual one-hot gather (XLA-fused reduce)."""
        oh = (slot[None, :, :] == ks[:, None, None]).astype(dtype)
        return jnp.sum(oh * x[None, :, :], axis=1)

    active_c = sel(af) > 0.5                           # (K,B)
    actf = active_c.astype(dtype)

    aref_all = jnp.concatenate([efc.l_aref, efc.aref.reshape(-1, B)], axis=0)
    R_all = jnp.concatenate([efc.l_R, efc.R.reshape(-1, B)], axis=0)
    aref_c = sel(aref_all)
    R_c = sel(R_all)
    f0 = sel(f_warm)

    # contact-row wrench gather: rows L..nefc map to W6 (C,4,6,B)
    slot_con = slot[L:]                                # (4C,B)
    W6_rows = efc.W6.reshape(C * 4, 6, B)
    oh_con = (slot_con[None, :, :] == ks[:, None, None]).astype(dtype)
    W6_c = jnp.sum(oh_con[:, :, None, :] * W6_rows[None, :, :, :], axis=1)
    # (K,6,B)

    b1_rows = jnp.repeat(efc.body1, 4, axis=0).astype(dtype)   # (4C,B)
    b2_rows = jnp.repeat(efc.body2, 4, axis=0).astype(dtype)
    b1_c = jnp.sum(oh_con * b1_rows[None], axis=1)     # (K,B)
    b2_c = jnp.sum(oh_con * b2_rows[None], axis=1)

    masks = tree_masks(model.parents)
    body_dof = jnp.asarray(masks["body_dof"], dtype)   # (J,nv)
    nbody = body_dof.shape[0]
    js = jnp.arange(nbody, dtype=dtype)
    b1_oh = ((jnp.abs(b1_c[:, None, :] - js[None, :, None]) < 0.5)
             & (b1_c[:, None, :] > -0.5)).astype(dtype)        # (K,J,B)
    b2_oh = ((jnp.abs(b2_c[:, None, :] - js[None, :, None]) < 0.5)
             & (b2_c[:, None, :] > -0.5)).astype(dtype)
    # relmask (K,nv,B) = (b2_oh - b1_oh) @ body_dof, virtual over J
    relmask = jnp.sum(
        (b2_oh - b1_oh)[:, :, None, :] * body_dof[None, :, :, None], axis=1
    )

    # J rows directly in (nv,K,B): J[v,k] = sum_w S[v,w] W6_c[k,w]
    Jt = sum(S[:, w, None, :] * W6_c[None, :, w, :] for w in range(6))
    Jt = Jt * jnp.swapaxes(relmask, 0, 1)
    # + limit rows: J_lim[k,v] = sum_{i<L} oh[k,i] l_J[i,v]
    oh_lim = (slot[None, :L, :] == ks[:, None, None]).astype(dtype)
    J_lim = jnp.sum(
        oh_lim[:, :, None, :] * efc.l_J[None, :, :, :], axis=1
    )                                                   # (K,nv,B)
    Jt = Jt + jnp.swapaxes(J_lim, 0, 1)
    Jt = Jt * actf[None, :, :]                          # (nv,K,B)

    # fused smooth + Delassus: one factor of M, rhs = [qfrc | J^T]
    rhs = jnp.concatenate([qfrc[:, None, :], Jt], axis=1)      # (nv,1+K,B)
    X = Msolve(rhs)                                            # (nv,1+K,B)
    qacc_smooth = X[:, 0, :]
    W = X[:, 1:, :]                                            # (nv,K,B)

    A = jnp.sum(Jt[:, :, None, :] * W[:, None, :, :], axis=0)  # (K,K,B)
    eyeK = jnp.eye(K, dtype=dtype)[:, :, None]
    A = A + eyeK * R_c[None, :, :]
    b = aref_c - jnp.sum(Jt * qacc_smooth[:, None, :], axis=0)
    b = b * actf

    # QP over lanes (pad to the 128-lane grid with inert systems)
    Bp = (B + _BB - 1) // _BB * _BB
    if Bp != B:
        padl = Bp - B
        A = jnp.concatenate(
            [A, jnp.broadcast_to(eyeK, (K, K, padl))], axis=-1)
        b = jnp.pad(b, ((0, 0), (0, padl)))
        actf_p = jnp.pad(actf, ((0, 0), (0, padl)))
        f0 = jnp.pad(f0, ((0, 0), (0, padl)))
    else:
        actf_p = actf
    f = _qp_dispatch(A, b, actf_p, f0, iters)[:, :B]
    A = A[..., :B]
    b = b[..., :B]

    qfrc_con = jnp.sum(Jt * f[None, :, :], axis=1)             # (nv,B)
    qacc = qacc_smooth + jnp.sum(W * f[None, :, :], axis=1)

    # scatter compact forces to the full row layout
    oh_full = (slot[None, :, :] == ks[:, None, None]).astype(dtype)
    efc_force = jnp.sum(oh_full * f[:, None, :], axis=0)       # (nefc,B)

    nactive = jnp.sum(efc.active, axis=0).astype(jnp.int32)    # (B,)
    overflow = nactive > K
    from smplsim_tpu.ops.qp_kernel import _tol_for

    g = jnp.sum(A * f[None, :, :], axis=1) - b
    kkt = jnp.max(jnp.abs(f - jnp.maximum(f - g, 0.0)) * actf, axis=0)
    stalled = kkt > _tol_for(dtype) * (1.0 + jnp.max(jnp.abs(b), axis=0))
    return qacc, efc_force, nactive, overflow, stalled, qacc_smooth


# ---------------------------------------------------------------------------
# the control loop
# ---------------------------------------------------------------------------
def uhc_control_lanes(model, model_axes, qT, vT, M0, C0, fw0, targetT,
                      reset_q, reset_v, M_reset, C_reset, extT, projT,
                      control_freq_inv: int, qp_iters: int, K: int):
    """Lanes-last uhc_pd control step. All array args carry a trailing lane
    axis B where batched; model leaves are shared (original shape) or lanes
    ((..., B)); model_axes is the matching -1/None pytree for trailing
    vmaps. reset_* may be shared or lanes. extT (J,3,B) or None.

    Returns (qpos (nq,B), qvel (nv,B), M (nv,nv,B), C (nv,B), f_w (nefc,B),
    power (B,), nactive_max (B,), stalled_any (B,), gfc (ngeom,B))."""
    dtype = qT.dtype
    B = qT.shape[-1]
    nv = vT.shape[0]
    np_ = _pad8(nv)
    nefc = constraints.NEFC
    masks = tree_masks(model.parents)
    use_aba = _aba_enabled(dtype)

    from smplsim_tpu.models.spec import RobotModel  # noqa: F401 (doc)

    def bc(x, nd):
        return jnp.broadcast_to(_lane(x, nd), x.shape[:nd] + (B,)) \
            if x.ndim == nd else x

    reset_qT = bc(reset_q, 1)
    reset_vT = bc(reset_v, 1)
    Mr_T = _pad_spd(bc(M_reset, 2), np_)
    Cr_T = bc(C_reset, 1)

    gear = _lane(model.gear, 1)
    damping = _lane(model.dof_damping, 1)

    # trailing-vmap closures: EFC assembly and the integrator reuse the
    # per-env reference code with the batch as the minor axis (elementwise
    # contact math is lane-parallel automatically; the self-collision
    # custom_vmap dispatches to its lanes pipeline as usual)
    kin_axes = Kin(xpos=-1, xmat=-1, S=-1, com=-1, inertia_w=-1)
    has_proj = projT is not None
    if has_proj:
        p_pos0, p_vel0, p_rad, p_inv = projT
        nP = p_pos0.shape[0]
        efc_fn = jax.vmap(
            constraints.make_efc,
            in_axes=(model_axes, kin_axes, -1, -1, (-1, -1, -1, -1)),
            out_axes=-1,
        )
    else:
        p_pos0 = p_vel0 = jnp.zeros((0, 3, B), dtype)
        efc_fn = jax.vmap(
            constraints.make_efc,
            in_axes=(model_axes, kin_axes, -1, -1), out_axes=-1,
        )
    ts = jnp.asarray(model.timestep)
    integrate = jax.vmap(
        lambda q, v, a, d: integrator.euler_step(None, q, v, a, d),
        in_axes=(-1, -1, -1, (None if ts.ndim == 0 else -1)), out_axes=-1,
    )

    # loop-invariant model geometry (hoisted out of the substep scan)
    body_pos_l = jnp.asarray(model.body_pos, dtype)
    body_R_l = _body_R_local(model, dtype)
    body_ipos_l = jnp.asarray(model.body_ipos, dtype)
    body_inertia_l = jnp.asarray(model.body_inertia, dtype)

    def ext_qfrc(kin):
        if extT is None:
            return 0.0
        w = jnp.concatenate(
            [fk_lanes._cross(kin.com, extT), extT], axis=1)    # (J,6,B)
        sub = jnp.asarray(masks["dof_subtree_body"], dtype)
        J = w.shape[0]
        fC = (sub @ w.reshape(J, 6 * B)).reshape(nv, 6, B)
        return jnp.sum(kin.S * fC, axis=1)

    def substep(carry, _):
        if use_aba:
            (q, v, q_stale, C_prev, tau, f_w, power, nact, stall, _gfc,
             p_pos, p_vel) = carry
        else:
            (q, v, Mp_prev, C_prev, f_w, power, nact, stall, _gfc,
             p_pos, p_vel) = carry
            tau = stable_pd_lanes(model, Mp_prev, C_prev, q, v, targetT)

        kin_t = fk_lanes.fk_lanes(
            q, body_pos_l, body_R_l, body_ipos_l, body_inertia_l,
            model.parents)
        kin = Kin(*kin_t)

        if use_aba:
            Msolve = _aba_solver(model, kin)
        else:
            M = dynamics_lanes.mass_matrix_lanes(
                kin.S, kin.com, kin.inertia_w, model.body_mass,
                model.armature, masks)                         # (nv,nv,B)
            Msolve = Mp = _pad_spd(M, np_)
        C = dynamics_lanes.bias_forces_lanes(
            kin.S, kin.com, kin.inertia_w, model.body_mass, model.gravity,
            v, masks)
        act = jnp.concatenate(
            [jnp.zeros((6, B), dtype),
             jnp.broadcast_to(gear, (nv - 6, B)) * tau], axis=0)
        qfrc = act - jnp.broadcast_to(damping, (nv, B)) * v - C
        qfrc = qfrc + ext_qfrc(kin)

        if has_proj:
            efc = efc_fn(model, kin, q, v, (p_pos, p_vel, p_rad, p_inv))
        else:
            efc = efc_fn(model, kin, q, v)

        qacc, efc_force, nactive, overflow, stalled, qacc_smooth = \
            solve_constraints_lanes(model, kin.S, Msolve, qfrc, efc,
                                    f_w, qp_iters, K)

        q2, v2 = integrate(q, v, qacc, ts)

        if has_proj:
            from smplsim_tpu.physics.constraints import MAX_PROJC

            dt_l = _lane(jnp.asarray(model.timestep), 0)[None]   # (1,B?)
            ef_p = efc_force[-4 * MAX_PROJC:].reshape(MAX_PROJC, 4, B)
            dirs = efc.W6[-MAX_PROJC:, :, 3:6, :]                # (K,4,3,B)
            F_slot = -jnp.sum(ef_p[:, :, None, :] * dirs, axis=1)  # (K,3,B)
            sid = efc.proj_sphere                                # (K,B)
            sid_oh = (sid[:, None, :]
                      == jnp.arange(nP)[None, :, None]).astype(dtype)
            F_s = jnp.sum(sid_oh[:, :, None, :] * F_slot[:, None, :, :],
                          axis=0)                                # (P,3,B)
            grav = _lane(jnp.asarray(model.gravity, dtype), 1)   # (3,B?)
            p_vel2 = p_vel + dt_l * (p_inv[:, None, :] * F_s + grav[None])
            p_pos2 = p_pos + dt_l * p_vel2
            below = p_pos2[:, 2, :] < p_rad
            p_vel2 = p_vel2.at[:, 2, :].set(
                jnp.where(below, jnp.maximum(p_vel2[:, 2, :], 0.0),
                          p_vel2[:, 2, :]))
            p_pos2 = p_pos2.at[:, 2, :].set(
                jnp.maximum(p_pos2[:, 2, :], p_rad))
        else:
            p_pos2, p_vel2 = p_pos, p_vel

        # mjMAXVAL auto-reset (engine._state_bad semantics)
        def badr(x):
            return jnp.any(~jnp.isfinite(x) | (jnp.abs(x) > 1e10), axis=0)

        bad = badr(q) | badr(v) | badr(qacc)                   # (B,)
        if use_aba:
            # next substep's stable-PD torque, computed HERE where its stale
            # (M, C) pair — this substep's kinematics and bias — is live, so
            # the scan never carries (or factors) a dense mass matrix. Bad
            # lanes take the precomputed reset torque (their PD inputs are
            # the reset constants).
            tau_next = stable_pd_lanes(
                model, _aba_solver(model, kin), C, q2, v2, targetT)
            tau_next = jnp.where(bad[None], tau_reset, tau_next)
            q_stale2 = jnp.where(
                bad[None], jnp.broadcast_to(reset_qT, q.shape), q)
        q2 = jnp.where(bad[None], jnp.broadcast_to(reset_qT, q2.shape), q2)
        v2 = jnp.where(bad[None], jnp.broadcast_to(reset_vT, v2.shape), v2)
        C = jnp.where(bad[None], jnp.broadcast_to(Cr_T, C.shape), C)
        f_w2 = jnp.where(bad[None], 0.0, efc_force)
        power = power + jnp.where(
            bad, 0.0, jnp.sum(jnp.abs(tau * v[6:]), axis=0))
        nact = jnp.maximum(nact, nactive)
        stall = stall | stalled
        gfc = efc.geom_floor_contact                           # (ngeom,B)
        if use_aba:
            return (q2, v2, q_stale2, C, tau_next, f_w2, power, nact, stall,
                    gfc, p_pos2, p_vel2), None
        Mp = jnp.where(bad[None, None], jnp.broadcast_to(Mr_T, Mp.shape), Mp)
        return (q2, v2, Mp, C, f_w2, power, nact, stall, gfc,
                p_pos2, p_vel2), None

    Mp0 = _pad_spd(bc(M0, 2), np_)
    C0b = bc(C0, 1)
    zstats = (jnp.zeros((B,), dtype), jnp.zeros((B,), jnp.int32),
              jnp.zeros((B,), bool),
              jnp.zeros((len(model.geom_type), B), bool))
    if use_aba:
        # first-substep torque against the env-carried stale dense M0 (the
        # only place the dense factor kernel still runs: once per control
        # step); the scan then hands each substep the NEXT one's torque.
        tau0 = stable_pd_lanes(model, Mp0, C0b, qT, vT, targetT)
        reset_kin = Kin(*fk_lanes.fk_lanes(
            reset_qT, body_pos_l, body_R_l, body_ipos_l, body_inertia_l,
            model.parents))
        tau_reset = stable_pd_lanes(
            model, _aba_solver(model, reset_kin), Cr_T, reset_qT, reset_vT,
            targetT)
        carry = (qT, vT, qT, C0b, tau0, fw0) + zstats + (p_pos0, p_vel0)
    else:
        carry = (qT, vT, Mp0, C0b, fw0) + zstats + (p_pos0, p_vel0)
    carry, _ = jax.lax.scan(substep, carry, None, length=control_freq_inv)
    if use_aba:
        (q, v, q_stale, C, _tau, f_w, power, nact, stall, gfc,
         p_pos, p_vel) = carry
        # the env cache's stale-M lifecycle: M at the LAST substep's
        # pre-integration pose (reset pose on auto-reset lanes) — one dense
        # CRBA per control step instead of 15.
        kinf = Kin(*fk_lanes.fk_lanes(
            q_stale, body_pos_l, body_R_l, body_ipos_l, body_inertia_l,
            model.parents))
        M_last = dynamics_lanes.mass_matrix_lanes(
            kinf.S, kinf.com, kinf.inertia_w, model.body_mass,
            model.armature, masks)
    else:
        q, v, Mp, C, f_w, power, nact, stall, gfc, p_pos, p_vel = carry
        M_last = Mp[:nv, :nv, :]
    base = (q, v, M_last, C, f_w, power, nact, stall, gfc)
    return base + ((p_pos, p_vel) if has_proj else ())


def _body_R_local(model, dtype):
    from smplsim_tpu import transforms as T

    q = jnp.asarray(model.body_quat, dtype)
    if q.ndim == 3:  # per-env body quats, lanes (J,4,B)
        return jax.vmap(T.quat_to_matrix, in_axes=-1, out_axes=-1)(q)
    return T.quat_to_matrix(q)
