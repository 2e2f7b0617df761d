"""Self-collision candidate pipeline, batch-in-lanes formulation.

`collision_pairs.self_contacts` vmapped over envs produces op chains on
(B, P, 3)-shaped arrays whose tiny minor dimensions pad to full (8,128) TPU
tiles; the box-box manifold alone is ~300 ops on (B, P, 25, 3) shapes. This
module computes the SAME candidate sets with the flattened batch axis as the
MINOR dimension — vectors are (3, P, B), matrices (3, 3, P, B), scalars
(P, B) — so every elementwise op runs at full lane utilization and static
per-pair indices stay trace-time gathers.

Exposed through `collision_pairs.self_contacts` (custom_vmap): per-env calls
use the reference blocks in collision_pairs; under the engine's env vmap the
whole batch lands here. Algorithms are line-for-line ports of the reference
routines (capsule-capsule closest points incl. the parallel-overlap slots,
the conservative broadphase culls, and the decoded mjc_BoxBox manifold —
see collision_pairs._box_box_one for the semantics notes); only the data
layout changes, so results match the reference path to f32 rounding.

Model arrays may be shared ((...,) + trailing lane axis of 1) or per-env
batched ((..., B)) — β-heterogeneous robot stacks thread through.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from smplsim_tpu.physics import capsulebox_lanes

# ---------------------------------------------------------------------------
# layout helpers: vectors (3, P, L), matrices (3, 3, P, L), scalars (P, L)
# where L is the lane (batch) axis — possibly 1 for shared constants
# ---------------------------------------------------------------------------


def _dot(a, b):
    return jnp.sum(a * b, axis=0)


def _cross(a, b):
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def _norm(a, eps=0.0):
    n2 = _dot(a, a)
    return jnp.sqrt(jnp.maximum(n2, eps)) if eps else jnp.sqrt(n2)


def _mv(R, v):
    """R (3,3,P,L) @ v (3,P,L) -> (3,P,L)."""
    return jnp.stack([
        R[0, 0] * v[0] + R[0, 1] * v[1] + R[0, 2] * v[2],
        R[1, 0] * v[0] + R[1, 1] * v[1] + R[1, 2] * v[2],
        R[2, 0] * v[0] + R[2, 1] * v[1] + R[2, 2] * v[2],
    ])


def _mtv(R, v):
    """R^T @ v."""
    return jnp.stack([
        R[0, 0] * v[0] + R[1, 0] * v[1] + R[2, 0] * v[2],
        R[0, 1] * v[0] + R[1, 1] * v[1] + R[2, 1] * v[2],
        R[0, 2] * v[0] + R[1, 2] * v[1] + R[2, 2] * v[2],
    ])


def _mm(A, B):
    """A (3,3,P,L) @ B (3,3,P,L) -> (3,3,P,L)."""
    return jnp.stack([
        jnp.stack([sum(A[i, k] * B[k, j] for k in range(3)) for j in range(3)])
        for i in range(3)
    ])


def _quat_mat(q):
    """wxyz quaternion (4, P, L) -> rotation matrix (3, 3, P, L)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]),
    ])


def _gsel(x, idx, comp_ndim):
    """Select per-geom model array rows by STATIC index array.

    x: (G, c...) shared or (G, c..., L) batched (trailing lane axis added by
    the custom_vmap rule). Returns (c..., P, L) with L=1 when shared.
    """
    batched = x.ndim == 1 + comp_ndim + 1
    sel = x[idx]                               # (P, c...) or (P, c..., L)
    if not batched:
        sel = sel[..., None]                   # (P, c..., 1)
    return jnp.moveaxis(sel, 0, -2)            # (c..., P, L)


def _top_k_onehot_lanes(score, k):
    """score (P, L) -> selection one-hot (k, P, L); lax.top_k semantics
    (first-index tie-break), no sort — see constraints.top_k_onehot."""
    P = score.shape[0]
    s = jnp.where(jnp.isnan(score), -jnp.inf, score)
    gt = (s[None, :, :] > s[:, None, :]).astype(jnp.int32)       # [i,j,l]
    iota = np.arange(P, dtype=np.int32)
    tie = ((s[None, :, :] == s[:, None, :])
           & (iota[None, :, None] < iota[:, None, None]))
    rank = jnp.sum(gt + tie.astype(jnp.int32), axis=1)           # (P, L)
    return (rank[None] == np.arange(k, dtype=np.int32)[:, None, None]
            ).astype(score.dtype)


def _sel_scalar(oh, x):
    """oh (k,P,L), x (P,L) -> (k,L)."""
    return jnp.sum(oh * x[None], axis=1)


def _sel_vec(oh, v):
    """oh (k,P,L), v (3,P,L) -> (3,k,L)."""
    return jnp.stack([_sel_scalar(oh, v[c]) for c in range(3)])


def _sel_mat(oh, M):
    """oh (k,P,L), M (3,3,P,L) -> (3,3,k,L)."""
    return jnp.stack([_sel_vec(oh, M[i]) for i in range(3)])


# ---------------------------------------------------------------------------
# world poses of static geom lists
# ---------------------------------------------------------------------------
def _world_box(xpos_l, xmat_l, geom_pos, geom_quat, geom_size, gidx, bodies):
    """Box world pose: center (3,P,B), R (3,3,P,B), half (3,P,L)."""
    Rb = jnp.moveaxis(xmat_l[bodies], 0, 2)        # (3,3,P,B)
    xb = jnp.moveaxis(xpos_l[bodies], 0, 1)        # (3,P,B)
    gp = _gsel(geom_pos, gidx, 1)                  # (3,P,L)
    gq = _gsel(geom_quat, gidx, 1)                 # (4,P,L)
    half = _gsel(geom_size, gidx, 1)               # (3,P,L)
    Rg = _mm(Rb, _quat_mat(gq) * jnp.ones_like(Rb[:, :, :1, :1]))
    pos = xb + _mv(Rb, gp * jnp.ones_like(xb[:1]))
    return pos, Rg, half


def _world_segment(xpos_l, xmat_l, geom_pos, geom_quat, geom_size, gidx,
                   bodies, is_cap):
    """Capsule/sphere world segment: p, q (3,P,B), r (P,L)."""
    Rb = jnp.moveaxis(xmat_l[bodies], 0, 2)
    xb = jnp.moveaxis(xpos_l[bodies], 0, 1)
    gp = _gsel(geom_pos, gidx, 1)
    gq = _gsel(geom_quat, gidx, 1)
    size = _gsel(geom_size, gidx, 1)               # (3,P,L)
    Rq = _quat_mat(gq)                             # (3,3,P,L)
    axis_local = Rq[:, 2]                          # (3,P,L) geom-frame z col
    axis_w = _mv(Rb, axis_local * jnp.ones_like(xb[:1]))
    center = xb + _mv(Rb, gp * jnp.ones_like(xb[:1]))
    halflen = size[1] * is_cap[:, None]            # (P,L)
    p = center - halflen[None] * axis_w
    q = center + halflen[None] * axis_w
    return p, q, size[0]


# ---------------------------------------------------------------------------
# capsule-capsule (3 slots per pair: 2 parallel-overlap + 1 regular)
# ---------------------------------------------------------------------------
def _seg_seg_closest(p1, q1, p2, q2, eps=1e-12):
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = _dot(d1, d1)
    e = _dot(d2, d2)
    f = _dot(d2, r)
    c = _dot(d1, r)
    b = _dot(d1, d2)
    denom = a * e - b * b
    parallel = denom < eps * a * e + eps
    s = jnp.where(
        parallel, 0.0,
        jnp.clip((b * f - c * e) / jnp.where(parallel, 1.0, denom), 0.0, 1.0),
    )
    t = (b * s + f) / jnp.maximum(e, eps)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, eps), 0.0, 1.0)
    c1 = p1 + s[None] * d1
    c2 = p2 + t_cl[None] * d2
    return c1, c2, parallel


def _cc_family(p1, q1, r1, p2, q2, r2):
    """Returns dist (3,P,B), pos (3,3,P,B), normal (3,3,P,B) — leading axis
    is the slot (parallel-a, parallel-b, regular)."""
    c1, c2, par = _seg_seg_closest(p1, q1, p2, q2)
    delta = c2 - c1
    gap = _norm(delta)
    n = delta / jnp.maximum(gap, 1e-12)[None]
    dist = gap - r1 - r2
    pos = 0.5 * (c1 + r1[None] * n + c2 - r2[None] * n)

    d1 = q1 - p1
    len1sq = jnp.maximum(_dot(d1, d1), 1e-12)
    d2 = q2 - p2
    len2sq = jnp.maximum(_dot(d2, d2), 1e-12)
    slots_d, slots_p, slots_n = [], [], []
    for other in (p2, q2):
        tt = jnp.clip(_dot(other - p1, d1) / len1sq, 0.0, 1.0)
        c1p = p1 + tt[None] * d1
        t2 = jnp.clip(_dot(c1p - p2, d2) / len2sq, 0.0, 1.0)
        c2p = p2 + t2[None] * d2
        dd = c2p - c1p
        gg = _norm(dd)
        nn = dd / jnp.maximum(gg, 1e-12)[None]
        dpar = gg - r1 - r2
        ppar = 0.5 * (c1p + r1[None] * nn + c2p - r2[None] * nn)
        slots_d.append(jnp.where(par, dpar, 1e9))
        slots_p.append(ppar)
        slots_n.append(nn)
    slots_d.append(jnp.where(par, 1e9, dist))
    slots_p.append(pos)
    slots_n.append(n)
    return jnp.stack(slots_d), jnp.stack(slots_p), jnp.stack(slots_n)


# ---------------------------------------------------------------------------
# box-box: lanes port of collision_pairs._box_box_one (decoded mjc_BoxBox)
# ---------------------------------------------------------------------------
_BB_SLOTS = 25

_LOOP = np.asarray([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]])
# adjacency permutations in loop order (see reference)
_PU = np.asarray([[0, 1, 0, 0], [1, 0, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]],
                 dtype=np.float64)
_PV = np.asarray([[0, 0, 0, 1], [0, 0, 1, 0], [0, 1, 0, 0], [1, 0, 0, 0]],
                 dtype=np.float64)
_PRIO = np.asarray(
    [[[2.0, 1.0, 3.0, 4.0], [4.0, 3.0, 1.0, 2.0]],
     [[3.0, 4.0, 2.0, 1.0], [4.0, 3.0, 1.0, 2.0]],
     [[4.0, 2.0, 1.0, 3.0], [2.0, 4.0, 3.0, 1.0]]])


def _box_box_lanes(p1, R1, h1, p2, R2, h2, margin):
    """All-lanes decoded mjc_BoxBox manifold. Inputs: p (3,P,B), R (3,3,P,B),
    h (3,P,L), margin (P,L). Returns dep (25,P,B), pos (25,3,P,B),
    normal (3,P,B), act (25,P,B) bool."""
    dtype = p1.dtype
    P, B = p1.shape[1], p1.shape[2]
    one = jnp.ones((P, B), dtype)
    h1 = h1 * one[None]
    h2 = h2 * one[None]
    margin = margin * one
    t = p2 - p1
    big = jnp.asarray(1e9, dtype)
    loop = np.asarray(_LOOP, dtype)   # dtype-pinned corner signs (x64 hygiene)

    cols1 = [R1[:, k] for k in range(3)]           # each (3,P,B)
    cols2 = [R2[:, k] for k in range(3)]

    # ---- SAT over 6 face + 9 edge axes, probe order, relative preference
    pens, axes = [], []
    for k in range(3):
        a = cols1[k]
        pen = (h1[k]
               + sum(jnp.abs(_dot(a, cols2[j])) * h2[j] for j in range(3))
               - jnp.abs(_dot(a, t)))
        pens.append(pen)
        axes.append(a)
    for k in range(3):
        a = cols2[k]
        pen = (sum(jnp.abs(_dot(a, cols1[i])) * h1[i] for i in range(3))
               + h2[k] - jnp.abs(_dot(a, t)))
        pens.append(pen)
        axes.append(a)
    for i in range(3):
        for j in range(3):
            cr = _cross(cols1[i], cols2[j])
            cn = _norm(cr)
            good = cn > 1e-15
            ea = cr / jnp.maximum(cn, 1e-15)[None]
            pen = jnp.where(
                good,
                sum(jnp.abs(_dot(ea, cols1[a])) * h1[a] for a in range(3))
                + sum(jnp.abs(_dot(ea, cols2[a])) * h2[a] for a in range(3))
                - jnp.abs(_dot(ea, t)),
                big,
            )
            pens.append(pen)
            axes.append(ea)

    best = pens[0]
    code = jnp.zeros((P, B), jnp.int32)
    for k in range(1, 15):
        better = pens[k] < best * (1.0 - 1e-12)
        best = jnp.where(better, pens[k], best)
        code = jnp.where(better, k, code)
    axes_st = jnp.stack(axes)                       # (15,3,P,B)
    code_oh = (code[None] == np.arange(15, dtype=np.int32)[:, None, None]
               ).astype(dtype)                      # (15,P,B)
    raw = jnp.sum(code_oh[:, None] * axes_st, axis=0)   # (3,P,B)
    s_or = jnp.sign(_dot(raw, t))
    s_or = jnp.where(s_or == 0, 1.0, s_or).astype(dtype)
    a_ax = raw * s_or[None]                         # box1 -> box2
    use_edge = code >= 6
    ref_is_1 = code < 3

    def pick_v(c1, c2):
        return jnp.where(ref_is_1[None], c1, c2)

    def pick_m(m1, m2):
        return jnp.where(ref_is_1[None, None], m1, m2)

    # =================== FACE-case manifold ===================
    rp = pick_v(p1, p2)
    rR = pick_m(R1, R2)
    rh = pick_v(h1, h2)
    ip_ = pick_v(p2, p1)
    iR = pick_m(R2, R1)
    ih = pick_v(h2, h1)
    rn = jnp.where(ref_is_1, 1.0, -1.0).astype(dtype)[None] * a_ax

    kref = jnp.clip(code, 0, 5) % 3
    koh = (kref[None] == np.arange(3, dtype=np.int32)[:, None, None]
           ).astype(dtype)                          # (3,P,B)
    koh1 = jnp.roll(koh, 1, axis=0)
    koh2 = jnp.roll(koh, 2, axis=0)

    def mcol_of(R, oh):
        # sum_k oh[k] * R[:,k]
        return (R[:, 0] * oh[0][None] + R[:, 1] * oh[1][None]
                + R[:, 2] * oh[2][None])

    def hdot(h, oh):
        return h[0] * oh[0] + h[1] * oh[1] + h[2] * oh[2]

    mcol = mcol_of(rR, koh)
    sk = jnp.sign(_dot(mcol, rn))
    sk = jnp.where(sk == 0, 1.0, sk).astype(dtype)
    mr = mcol * sk[None]
    cr_ = rp + mr * hdot(rh, koh)[None]
    hu = hdot(rh, koh1)
    hv = hdot(rh, koh2)
    eu = mcol_of(rR, koh1)
    ev = mcol_of(rR, koh2)

    idots = _mtv(iR, -rn)                           # (3,P,B)
    iabs = jnp.abs(idots)
    imax = jnp.maximum(jnp.maximum(iabs[0], iabs[1]), iabs[2])
    # argmax with first-index tie-break
    i0 = iabs[0] >= imax
    i1 = ~i0 & (iabs[1] >= imax)
    ioh = jnp.stack([i0.astype(dtype), i1.astype(dtype),
                     (~i0 & ~i1).astype(dtype)])
    si = jnp.sign(idots[0] * ioh[0] + idots[1] * ioh[1] + idots[2] * ioh[2])
    si = jnp.where(si == 0, 1.0, si).astype(dtype)
    mi = mcol_of(iR, ioh) * si[None]
    ci = ip_ + mi * hdot(ih, ioh)[None]
    ioh1 = jnp.roll(ioh, 1, axis=0)
    ioh2 = jnp.roll(ioh, 2, axis=0)
    iu = mcol_of(iR, ioh1) * hdot(ih, ioh1)[None]
    iv = mcol_of(iR, ioh2) * hdot(ih, ioh2)[None]

    rn_mr = _dot(rn, mr)
    rn_mr = jnp.where(jnp.abs(rn_mr) > 1e-12, rn_mr, 1e-12)
    Qu, Qv, D4 = [], [], []
    for c in range(4):
        Ci = ci + loop[c, 0] * iu + loop[c, 1] * iv
        lam = _dot(cr_ - Ci, mr) / rn_mr
        Qi3 = Ci + lam[None] * rn
        Qu.append(_dot(Qi3 - cr_, eu))
        Qv.append(_dot(Qi3 - cr_, ev))
        D4.append(_dot(Ci - cr_, mr))
    Qu = jnp.stack(Qu)                              # (4,P,B)
    Qv = jnp.stack(Qv)
    D4 = jnp.stack(D4)

    # clcorner sign-bit rule
    al = (_dot(raw, t) * jnp.where(ref_is_1, 1.0, -1.0).astype(dtype)) < 0
    bit_u = (_dot(raw, iu) > 0) != al
    bit_v = (_dot(raw, iv) > 0) != al
    su = jnp.where(bit_u, -1.0, 1.0).astype(dtype)
    sv = jnp.where(bit_v, -1.0, 1.0).astype(dtype)
    c0_oh = jnp.stack([
        ((loop[c, 0] == 1.0) == (su > 0)) & ((loop[c, 1] == 1.0) == (sv > 0))
        for c in range(4)
    ]).astype(dtype)                                # (4,P,B)

    in_u = _dot(iu, rn) ** 2 < 0.25 * _dot(iu, iu)
    in_v = _dot(iv, rn) ** 2 < 0.25 * _dot(iv, iv)
    n_in = in_u.astype(jnp.int32) + in_v.astype(jnp.int32)

    PU = jnp.asarray(_PU, dtype)
    PV = jnp.asarray(_PV, dtype)
    pu_c0 = jnp.einsum("rc,cpb->rpb", PU, c0_oh)
    pv_c0 = jnp.einsum("rc,cpb->rpb", PV, c0_oh)
    nb_oh = jnp.where(in_u[None], pu_c0, pv_c0)     # (4,P,B)

    edge_both = ((c0_oh * jnp.roll(nb_oh, -1, axis=0))
                 + (nb_oh * jnp.roll(c0_oh, -1, axis=0))) > 0.5
    line_act = jnp.where(
        n_in[None] >= 2, jnp.ones_like(edge_both),
        jnp.where(n_in[None] == 1, edge_both, jnp.zeros_like(edge_both)),
    )

    QAu, QAv, DA = Qu, Qv, D4
    QBu = jnp.roll(Qu, -1, axis=0)
    QBv = jnp.roll(Qv, -1, axis=0)
    DB = jnp.roll(D4, -1, axis=0)
    dvu = QBu - QAu
    dvv = QBv - QAv
    f_qu, f_qv, f_d, f_act = [], [], [], []
    for axis in (0, 1):
        den = dvu if axis == 0 else dvv
        lim = hu if axis == 0 else hv
        olim = hv if axis == 0 else hu
        Qa_ax = QAu if axis == 0 else QAv
        Qa_other = QAv if axis == 0 else QAu
        dv_other = dvv if axis == 0 else dvu
        for sgn in (1.0, -1.0):
            ok = jnp.abs(den) > 1e-15
            tt = (sgn * lim[None] - Qa_ax) / jnp.where(ok, den, 1.0)
            qu = QAu + tt * dvu
            qv = QAv + tt * dvv
            q_other = Qa_other + tt * dv_other
            act = (line_act & ok & (tt >= 0.0) & (tt <= 1.0)
                   & (jnp.abs(q_other) <= olim[None]))
            f_qu.append(qu)
            f_qv.append(qv)
            f_d.append(DA + tt * (DB - DA))
            f_act.append(act)
    # slot order: edge-major, border order within edge -> (4 edges, 4 borders)
    fqu = jnp.stack(f_qu, axis=1).reshape(16, P, B)
    fqv = jnp.stack(f_qv, axis=1).reshape(16, P, B)
    fd = jnp.stack(f_d, axis=1).reshape(16, P, B)
    fact = jnp.stack(f_act, axis=1).reshape(16, P, B)

    # contained reference-rect corners (2-in-plane regime only)
    def c0dot(arr):
        return jnp.sum(c0_oh * arr, axis=0)

    q0u = c0dot(Qu)
    q0v = c0dot(Qv)
    D0 = c0dot(D4)
    quu = jnp.sum(pu_c0 * Qu, axis=0)
    quv = jnp.sum(pu_c0 * Qv, axis=0)
    qvu = jnp.sum(pv_c0 * Qu, axis=0)
    qvv = jnp.sum(pv_c0 * Qv, axis=0)
    Du = jnp.sum(pu_c0 * D4, axis=0) - D0
    Dv = jnp.sum(pv_c0 * D4, axis=0) - D0
    Uu, Uv = quu - q0u, quv - q0v
    Vu, Vv = qvu - q0u, qvv - q0v
    det = Uu * Vv - Uv * Vu
    det_ok = jnp.abs(det) > 1e-15
    det_s = jnp.where(det_ok, det, 1.0)
    rc_qu, rc_qv, rc_d, rc_act = [], [], [], []
    for su_ in (1.0, -1.0):
        for sv_ in (1.0, -1.0):
            rcu = su_ * hu
            rcv = sv_ * hv
            wu = rcu - q0u
            wv = rcv - q0v
            aa = (wu * Vv - wv * Vu) / det_s
            bb = (Uu * wv - Uv * wu) / det_s
            rc_qu.append(rcu)
            rc_qv.append(rcv)
            rc_d.append(D0 + aa * Du + bb * Dv)
            rc_act.append(
                (n_in >= 2) & det_ok
                & (aa >= 0.0) & (aa <= 1.0) & (bb >= 0.0) & (bb <= 1.0)
            )
    rcqu = jnp.stack(rc_qu)
    rcqv = jnp.stack(rc_qv)
    rcd = jnp.stack(rc_d)
    rcact = jnp.stack(rc_act)

    inside_rect = (jnp.abs(Qu) <= hu[None]) & (jnp.abs(Qv) <= hv[None])
    allowed = jnp.where(
        n_in[None] >= 2, jnp.ones_like(inside_rect),
        jnp.where(n_in[None] == 1, nb_oh > 0.5, jnp.zeros_like(inside_rect)),
    )
    qc_act = inside_rect & allowed

    face_qu = jnp.concatenate([fqu, rcqu, Qu, q0u[None]], axis=0)   # (25,P,B)
    face_qv = jnp.concatenate([fqv, rcqv, Qv, q0v[None]], axis=0)
    face_d = jnp.concatenate([fd, rcd, D4, D0[None]], axis=0)
    face_act = jnp.concatenate(
        [fact, rcact, qc_act, jnp.ones_like(q0u[None], dtype=bool)], axis=0
    )
    # face positions (25,3,P,B)
    face_pos = (cr_[None] + face_qu[:, None] * eu[None]
                + face_qv[:, None] * ev[None]
                + 0.5 * face_d[:, None] * mr[None])

    # =================== EDGE-case manifold ===================
    def support_face(p, R, h, toward):
        dots = _mtv(R, toward)
        dabs = jnp.abs(dots)
        dmax = jnp.maximum(jnp.maximum(dabs[0], dabs[1]), dabs[2])
        s0 = dabs[0] >= dmax
        s1 = ~s0 & (dabs[1] >= dmax)
        oh = jnp.stack([s0.astype(dtype), s1.astype(dtype),
                        (~s0 & ~s1).astype(dtype)])
        sg = jnp.sign(jnp.sum(dots * oh, axis=0))
        sg = jnp.where(sg == 0, 1.0, sg).astype(dtype)
        m = mcol_of(R, oh) * sg[None]
        c = p + m * hdot(h, oh)[None]
        oh1 = jnp.roll(oh, 1, axis=0)
        oh2 = jnp.roll(oh, 2, axis=0)
        fu = mcol_of(R, oh1) * hdot(h, oh1)[None]
        fv = mcol_of(R, oh2) * hdot(h, oh2)[None]
        return c, m, fu, fv, oh, sg

    c1p_, m1, f1u, f1v, oh1f, sg1f = support_face(p1, R1, h1, a_ax)
    c2p_, m2, f2u, f2v, _, _ = support_face(p2, R2, h2, -a_ax)
    seed = jnp.where(
        (jnp.abs(a_ax[2]) > 0.9)[None],
        jnp.asarray([0.0, 1.0, 0.0], dtype)[:, None, None],
        jnp.asarray([0.0, 0.0, 1.0], dtype)[:, None, None],
    )
    ue = seed - _dot(seed * jnp.ones_like(a_ax), a_ax)[None] * a_ax
    ue = ue / jnp.maximum(_norm(ue), 1e-12)[None]
    ve = _cross(a_ax, ue)
    O = p1

    def to2d(Pt):
        return _dot(Pt - O, ue), _dot(Pt - O, ve)

    Q1u, Q1v, Q2u, Q2v = [], [], [], []
    for c in range(4):
        C1c = c1p_ + loop[c, 0] * f1u + loop[c, 1] * f1v
        C2c = c2p_ + loop[c, 0] * f2u + loop[c, 1] * f2v
        u_, v_ = to2d(C1c)
        Q1u.append(u_)
        Q1v.append(v_)
        u_, v_ = to2d(C2c)
        Q2u.append(u_)
        Q2v.append(v_)
    Q1u = jnp.stack(Q1u)
    Q1v = jnp.stack(Q1v)
    Q2u = jnp.stack(Q2u)
    Q2v = jnp.stack(Q2v)

    am1 = _dot(a_ax, m1)
    am2 = _dot(a_ax, m2)
    am1 = jnp.where(jnp.abs(am1) > 1e-12, am1, 1e-12)
    am2 = jnp.where(jnp.abs(am2) > 1e-12, am2, 1e-12)
    cm1 = _dot(c1p_ - O, m1)
    cm2 = _dot(c2p_ - O, m2)
    uem1 = _dot(ue, m1)
    vem1 = _dot(ve, m1)
    uem2 = _dot(ue, m2)
    vem2 = _dot(ve, m2)

    def alpha1(xu, xv):
        return (cm1[None] - xu * uem1[None] - xv * vem1[None]) / am1[None]

    def alpha2(xu, xv):
        return (cm2[None] - xu * uem2[None] - xv * vem2[None]) / am2[None]

    def depth_at(xu, xv):
        return alpha2(xu, xv) - alpha1(xu, xv)

    # 16 pairwise edge crossings
    A1u = jnp.repeat(Q1u, 4, axis=0)
    A1v = jnp.repeat(Q1v, 4, axis=0)
    B1u = jnp.repeat(jnp.roll(Q1u, -1, axis=0), 4, axis=0)
    B1v = jnp.repeat(jnp.roll(Q1v, -1, axis=0), 4, axis=0)
    A2u = jnp.tile(Q2u, (4, 1, 1))
    A2v = jnp.tile(Q2v, (4, 1, 1))
    B2u = jnp.tile(jnp.roll(Q2u, -1, axis=0), (4, 1, 1))
    B2v = jnp.tile(jnp.roll(Q2v, -1, axis=0), (4, 1, 1))
    d1u = B1u - A1u
    d1v = B1v - A1v
    d2u = B2u - A2u
    d2v = B2v - A2v
    den = d1u * d2v - d1v * d2u
    den_ok = jnp.abs(den) >= 1e-14
    den_s = jnp.where(den_ok, den, 1.0)
    w0u = A2u - A1u
    w0v = A2v - A1v
    tt = (w0u * d2v - w0v * d2u) / den_s
    ss = (w0u * d1v - w0v * d1u) / den_s
    xptu = A1u + tt * d1u
    xptv = A1v + tt * d1v
    xact = den_ok & (tt >= 0.0) & (tt <= 1.0) & (ss >= 0.0) & (ss <= 1.0)

    def inside(ptsu, ptsv, qu, qv):
        # pts (S,P,B) inside quad (4,P,B)
        eu_ = jnp.roll(qu, -1, axis=0) - qu
        ev_ = jnp.roll(qv, -1, axis=0) - qv
        relu = ptsu[:, None] - qu[None]
        relv = ptsv[:, None] - qv[None]
        cz = eu_[None] * relv - ev_[None] * relu      # (S,4,P,B)
        return (jnp.all(cz >= -1e-12, axis=1) | jnp.all(cz <= 1e-12, axis=1))

    c1in = inside(Q1u, Q1v, Q2u, Q2v)
    c2in = inside(Q2u, Q2v, Q1u, Q1v)
    prio = jnp.einsum(
        "kpb,spb,ksl->lpb", oh1f,
        jnp.stack([(sg1f > 0).astype(dtype), (sg1f <= 0).astype(dtype)]),
        jnp.asarray(_PRIO, dtype),
    )                                                 # (4,P,B)
    score = jnp.where(c1in, prio, 0.0)
    smax = jnp.max(score, axis=0)
    s0 = score[0] >= smax
    s1_ = ~s0 & (score[1] >= smax)
    s2_ = ~s0 & ~s1_ & (score[2] >= smax)
    c1pick = jnp.stack([s0, s1_, s2_, ~s0 & ~s1_ & ~s2_]).astype(dtype)
    c1_qu = jnp.sum(c1pick * Q1u, axis=0)
    c1_qv = jnp.sum(c1pick * Q1v, axis=0)
    c1_act = jnp.any(c1in, axis=0)

    edge_qu = jnp.concatenate(
        [xptu, Q2u, c1_qu[None], jnp.zeros((4, P, B), dtype)], axis=0)
    edge_qv = jnp.concatenate(
        [xptv, Q2v, c1_qv[None], jnp.zeros((4, P, B), dtype)], axis=0)
    edge_act = jnp.concatenate(
        [xact, c2in, c1_act[None], jnp.zeros((4, P, B), bool)], axis=0)
    edge_d = depth_at(edge_qu, edge_qv)
    edge_al1 = alpha1(edge_qu, edge_qv)
    edge_pos = (O[None] + edge_qu[:, None] * ue[None]
                + edge_qv[:, None] * ve[None]
                + (edge_al1 + 0.5 * edge_d)[:, None] * a_ax[None])

    # =================== select + shared filters ===================
    dep = jnp.where(use_edge[None], edge_d, face_d)
    pos = jnp.where(use_edge[None, None], edge_pos, face_pos)   # (25,3,P,B)
    act = jnp.where(use_edge[None], edge_act, face_act)
    act = act & (dep <= margin[None])

    def outside_flags(p, R, h):
        rel = pos - p[None]                           # (25,3,P,B)
        loc = jnp.stack([
            sum(rel[:, c] * R[c, i][None] for c in range(3)) for i in range(3)
        ], axis=1)                                    # (25,3,P,B)
        hs = (h + margin[None])[None]                 # (1,3,P,B)
        strict_in = jnp.all(jnp.abs(loc) <= hs / 1.01, axis=1)
        out = jnp.any(jnp.abs(loc) > hs * 1.01, axis=1)
        return strict_in, out

    in1, out1 = outside_flags(p1, R1, h1)
    in2, out2 = outside_flags(p2, R2, h2)
    act = act & ~((out1 & ~in2) | (out2 & ~in1))

    # exact dedup, keep lowest slot
    diff2 = sum(
        (pos[:, None, c] - pos[None, :, c]) ** 2 for c in range(3)
    )                                                 # (25,25,P,B)
    same = (diff2 < 1e-18) & act[:, None] & act[None, :]
    lower = np.tril(np.ones((_BB_SLOTS, _BB_SLOTS), bool), k=-1)
    act = act & ~jnp.any(same & lower[:, :, None, None], axis=1)

    # output cap: first 8 surviving candidates in slot order
    act = act & (jnp.cumsum(act.astype(jnp.int32), axis=0) <= 8)
    return dep, pos, a_ax, act


# ---------------------------------------------------------------------------
# whole-pipeline driver: all families' candidates, lanes-last
# ---------------------------------------------------------------------------
def self_candidates_lanes(
    meta, xpos_l, xmat_l, geom_pos, geom_quat, geom_size,
    geom_friction, geom_margin, keeps,
):
    """Compute all self-contact candidates for a batch, lanes-last.

    meta: static dict with "pairs" (collision_pairs._pair_lists output),
    "geom_body" and "is_cap" numpy arrays. Kin arrays carry a trailing lane
    axis B; per-geom model tables are shared ((G, ...)) or batched
    ((G, ..., B)). keeps: (CC_KEEP, CB_KEEP, BB_KEEP).

    Returns the SELECTED top-MAX_SELF contact slots, env-major: dist (B, S),
    pos (B, S, 3), normal (B, S, 3), body1/body2 (B, S) int32, mu (B, S),
    margin (B, S), active (B, S) bool.
    """
    dtype = xpos_l.dtype
    B = xpos_l.shape[-1]
    cc_keep, cb_keep, bb_keep = keeps
    pl = meta["pairs"]
    geom_body = meta["geom_body"]
    is_cap_all = meta["is_cap"]          # (G,) float numpy
    one_b = jnp.ones((1, B), dtype)

    def bcast_s(x):
        """(P,L) -> (P,B)."""
        return x * one_b

    def bcast_v(v):
        """(3,P,L) -> (3,P,B)."""
        return v * one_b[None]

    def pair_combine(g1, g2):
        mu1 = _gsel(geom_friction, g1, 1)[0]     # (P,L) sliding coefficient
        mu2 = _gsel(geom_friction, g2, 1)[0]
        m1 = _gsel(geom_margin, g1, 0)
        m2 = _gsel(geom_margin, g2, 0)
        return jnp.maximum(mu1, mu2), m1 + m2

    out_d, out_p, out_n, out_b1, out_b2, out_mu, out_mg = \
        [], [], [], [], [], [], []

    def emit(slots_d, slots_p, slots_n, b1_np, b2_np, mu, margin, koh=None,
             order="slot"):
        """slots_d (S,K,B), slots_p/n (S,3,K,B); b1/b2 static (P,) ints
        (selected via koh (K,P,B) when the family was culled); mu/margin
        (K,L). `order` is the reference path's candidate flattening: "slot"
        (slot-major, cc) or "pair" (pair-major, cb/bb) — it decides which
        candidate wins depth ties in the final top-k."""
        S, K = slots_d.shape[0], slots_d.shape[1]
        if koh is None:
            b1 = jnp.asarray(b1_np, jnp.int32)[:, None] * jnp.ones(
                (1, B), jnp.int32)
            b2 = jnp.asarray(b2_np, jnp.int32)[:, None] * jnp.ones(
                (1, B), jnp.int32)
        else:
            b1 = _sel_scalar(
                koh, bcast_s(jnp.asarray(b1_np, dtype)[:, None])
            ).astype(jnp.int32)
            b2 = _sel_scalar(
                koh, bcast_s(jnp.asarray(b2_np, dtype)[:, None])
            ).astype(jnp.int32)

        def fl(x):
            """Flatten candidate axes in `order`. Scalars (S,K,B) ->
            (S*K, B); vectors (S,3,K,B) -> (S*K, 3, B)."""
            if x.ndim == 4:                      # (S,3,K,B): slot,comp,pair,B
                x = jnp.transpose(x, (0, 2, 1, 3))   # (S,K,3,B)
                if order == "pair":
                    x = jnp.swapaxes(x, 0, 1)        # (K,S,3,B)
                return x.reshape(S * K, 3, B)
            if order == "pair":
                x = jnp.swapaxes(x, 0, 1)
            return x.reshape(S * K, B)

        out_d.append(fl(slots_d))
        out_p.append(fl(slots_p))
        out_n.append(fl(slots_n))
        out_b1.append(fl(jnp.broadcast_to(b1[None], (S, K, B))))
        out_b2.append(fl(jnp.broadcast_to(b2[None], (S, K, B))))
        out_mu.append(fl(jnp.broadcast_to(bcast_s(mu)[None], (S, K, B))))
        out_mg.append(fl(jnp.broadcast_to(bcast_s(margin)[None], (S, K, B))))

    # ---- capsule/sphere vs capsule/sphere --------------------------------
    if len(pl["cc"]):
        g1 = pl["cc"][:, 0]
        g2 = pl["cc"][:, 1]
        b1_np = geom_body[g1]
        b2_np = geom_body[g2]
        p1, q1, r1 = _world_segment(
            xpos_l, xmat_l, geom_pos, geom_quat, geom_size, g1, b1_np,
            jnp.asarray(is_cap_all[g1], dtype))
        p2, q2, r2 = _world_segment(
            xpos_l, xmat_l, geom_pos, geom_quat, geom_size, g2, b2_np,
            jnp.asarray(is_cap_all[g2], dtype))
        mu, margin = pair_combine(g1, g2)
        r1b, r2b = bcast_s(r1), bcast_s(r2)
        koh = None
        if len(pl["cc"]) > cc_keep:
            c1c = 0.5 * (p1 + q1)
            c2c = 0.5 * (p2 + q2)
            h1c = 0.5 * _norm(q1 - p1)
            h2c = 0.5 * _norm(q2 - p2)
            d_low = _norm(c1c - c2c) - h1c - h2c - r1b - r2b   # (P,B)
            koh = _top_k_onehot_lanes(-d_low, cc_keep)         # (K,P,B)
            p1, q1 = _sel_vec(koh, p1), _sel_vec(koh, q1)
            p2, q2 = _sel_vec(koh, p2), _sel_vec(koh, q2)
            r1b, r2b = _sel_scalar(koh, r1b), _sel_scalar(koh, r2b)
            mu = _sel_scalar(koh, bcast_s(mu))
            margin = _sel_scalar(koh, bcast_s(margin))
        d3, p3, n3 = _cc_family(p1, q1, r1b, p2, q2, r2b)
        emit(d3, p3, n3, b1_np, b2_np, mu, margin, koh)

    # ---- capsule/sphere vs box -------------------------------------------
    if len(pl["cb"]):
        g1 = pl["cb"][:, 0]
        g2 = pl["cb"][:, 1]
        b1_np = geom_body[g1]
        b2_np = geom_body[g2]
        p1, q1, r1 = _world_segment(
            xpos_l, xmat_l, geom_pos, geom_quat, geom_size, g1, b1_np,
            jnp.asarray(is_cap_all[g1], dtype))
        bpos, bR, half = _world_box(
            xpos_l, xmat_l, geom_pos, geom_quat, geom_size, g2, b2_np)
        mu, margin = pair_combine(g1, g2)
        r1b = bcast_s(r1)
        half_b = bcast_v(half)
        koh = None
        if len(pl["cb"]) > cb_keep:
            center = 0.5 * (p1 + q1)
            seg_half = 0.5 * _norm(q1 - p1)
            bound = _norm(half_b)
            d_low = _norm(center - bpos) - seg_half - r1b - bound
            koh = _top_k_onehot_lanes(-d_low, cb_keep)
            p1, q1 = _sel_vec(koh, p1), _sel_vec(koh, q1)
            bpos, bR = _sel_vec(koh, bpos), _sel_mat(koh, bR)
            half_b = _sel_vec(koh, half_b)
            r1b = _sel_scalar(koh, r1b)
            mu = _sel_scalar(koh, bcast_s(mu))
            margin = _sel_scalar(koh, bcast_s(margin))
        lp = _mtv(bR, p1 - bpos)                       # (3,K,B)
        lq = _mtv(bR, q1 - bpos)
        K = lp.shape[1]
        flat = lambda x: x.reshape(x.shape[0], K * B)
        d_cb, p_cb, n_cb = capsulebox_lanes.capsule_box_lanes(
            flat(lp), flat(lq), flat(half_b), r1b.reshape(K * B))
        d_cb = d_cb.reshape(2, K, B)
        p_cb = p_cb.reshape(2, 3, K, B)
        n_cb = n_cb.reshape(2, 3, K, B)
        p_w = jnp.stack([bpos + _mv(bR, p_cb[s]) for s in range(2)])
        n_w = jnp.stack([_mv(bR, n_cb[s]) for s in range(2)])
        emit(d_cb, p_w, n_w, b1_np, b2_np, mu, margin, koh, order="pair")

    # ---- box vs box -------------------------------------------------------
    if len(pl["bb"]):
        g1 = pl["bb"][:, 0]
        g2 = pl["bb"][:, 1]
        b1_np = geom_body[g1]
        b2_np = geom_body[g2]
        pos1, R1, h1 = _world_box(
            xpos_l, xmat_l, geom_pos, geom_quat, geom_size, g1, b1_np)
        pos2, R2, h2 = _world_box(
            xpos_l, xmat_l, geom_pos, geom_quat, geom_size, g2, b2_np)
        mu, margin = pair_combine(g1, g2)
        h1b, h2b = bcast_v(h1), bcast_v(h2)
        koh = None
        if len(pl["bb"]) > bb_keep:
            bound = _norm(h1b) + _norm(h2b)
            d_low = _norm(pos1 - pos2) - bound
            koh = _top_k_onehot_lanes(-d_low, bb_keep)
            pos1, R1 = _sel_vec(koh, pos1), _sel_mat(koh, R1)
            pos2, R2 = _sel_vec(koh, pos2), _sel_mat(koh, R2)
            h1b, h2b = _sel_vec(koh, h1b), _sel_vec(koh, h2b)
            mu = _sel_scalar(koh, bcast_s(mu))
            margin = _sel_scalar(koh, bcast_s(margin))
        mg_b = bcast_s(margin) if koh is None else margin
        dep, pos, nrm, act = _box_box_lanes(
            pos1, R1, h1b, pos2, R2, h2b, mg_b)
        d_bb = jnp.where(act, dep, 1e9)                # (25,K,B)
        # slot compaction 25 -> 8 by depth (mjc_BoxBox emits at most 8
        # surviving points; matches the reference path's compaction)
        soh8 = _top_k_onehot_lanes(
            -d_bb.reshape(25, -1), 8).reshape(8, 25, *d_bb.shape[1:])
        d_bb = jnp.sum(soh8 * d_bb[None], axis=1)      # (8,K,B)
        pos8 = jnp.stack([
            jnp.sum(soh8 * pos[None, :, c] , axis=1) for c in range(3)
        ], axis=1)                                     # (8,3,K,B)
        n_bb = jnp.broadcast_to(nrm[None], pos8.shape)
        emit(d_bb, pos8, n_bb, b1_np, b2_np, mu, margin, koh, order="pair")

    # ---- final depth-top-k selection, lanes-last --------------------------
    from smplsim_tpu.physics.collision_pairs import MAX_SELF

    dist = jnp.concatenate(out_d, axis=0)        # (N,B)
    pos = jnp.concatenate(out_p, axis=0)         # (N,3,B)
    normal = jnp.concatenate(out_n, axis=0)
    body1 = jnp.concatenate(out_b1, axis=0)      # (N,B) int32
    body2 = jnp.concatenate(out_b2, axis=0)
    mu = jnp.concatenate(out_mu, axis=0)
    margin = jnp.concatenate(out_mg, axis=0)

    active_all = dist < margin
    score = jnp.where(active_all, -dist, -1e9)
    soh = _top_k_onehot_lanes(score, MAX_SELF)   # (S,N,B)
    sval = _sel_scalar(soh, score)
    sel_d = _sel_scalar(soh, dist)
    sel_p = jnp.stack([_sel_scalar(soh, pos[:, c]) for c in range(3)],
                      axis=1)                    # (S,3,B)
    sel_n = jnp.stack([_sel_scalar(soh, normal[:, c]) for c in range(3)],
                      axis=1)
    sel_b1 = _sel_scalar(soh, body1.astype(dtype)).astype(jnp.int32)
    sel_b2 = _sel_scalar(soh, body2.astype(dtype)).astype(jnp.int32)
    sel_mu = _sel_scalar(soh, mu)
    sel_mg = _sel_scalar(soh, margin)
    sel_act = ((_sel_scalar(soh, active_all.astype(dtype)) > 0.5)
               & (sval > -1e9 / 2))
    # env-major: only (S, ...) slots cross the vmap boundary
    return (jnp.moveaxis(sel_d, -1, 0),
            jnp.moveaxis(sel_p, -1, 0),
            jnp.moveaxis(sel_n, -1, 0),
            jnp.moveaxis(sel_b1, -1, 0),
            jnp.moveaxis(sel_b2, -1, 0),
            jnp.moveaxis(sel_mu, -1, 0),
            jnp.moveaxis(sel_mg, -1, 0),
            jnp.moveaxis(sel_act, -1, 0))
