"""Body-body (self-)collision: capsule/box/sphere narrowphase, fixed shape.

TPU-native replacement for MuJoCo's geom-pair collision pipeline. Pair lists
are static (contype/conaffinity, parent-child filtering, explicit excludes —
matching MuJoCo's default filters); every pair's narrowphase runs every
substep as vectorized math and the deepest MAX_SELF contacts are kept.

Fidelity notes vs MuJoCo (see tests/test_self_collision.py):
  * capsule-capsule: exact (single contact at segment closest points;
    two contacts for near-parallel overlapping segments, like
    mjc_CapsuleCapsule).
  * capsule-box: one contact from minimizing the box SDF along the segment
    (MuJoCo's dedicated routine also emits 1 in the common cases).
  * box-box: corner-vs-box SDF candidates both ways (approximate manifold;
    MuJoCo's SAT face clipping can emit up to 8).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smplsim_tpu import transforms as T
from smplsim_tpu.models.spec import GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, RobotModel
from smplsim_tpu.physics.kinematics import Kin

import os as _os

MAX_SELF = 12
# Pairs surviving the conservative broadphase cull, per type family. The
# cull ranks pairs by a conservative LOWER BOUND on separation (pairs whose
# bound exceeds margin cannot touch), so narrowphase on the KEEP
# lowest-bound pairs can lose a touching pair whenever more than KEEP pairs
# have lower bounds below that pair's bound — loose-bound far pairs can
# evict a genuinely touching one. tests/test_self_collision.py::
# test_default_keeps_match_wide pins the shipped defaults against
# no-cull selection on the calibration pose set. Env overrides exist for
# calibration and for the tight parity tests (conftest pins 4096).
CC_KEEP = int(_os.environ.get("SMPLSIM_CC_KEEP", 24))  # capsule/sphere pairs
CB_KEEP = int(_os.environ.get("SMPLSIM_CB_KEEP", 16))  # capsule-box pairs
BB_KEEP = int(_os.environ.get("SMPLSIM_BB_KEEP", 8))   # box-box pairs


class SelfContacts(NamedTuple):
    dist: jax.Array     # (C,)
    pos: jax.Array      # (C,3)
    normal: jax.Array   # (C,3) from geom1 toward geom2
    body1: jax.Array    # (C,) int
    body2: jax.Array    # (C,) int
    friction: jax.Array   # (C,)
    margin: jax.Array     # (C,) includemargin
    active: jax.Array     # (C,) bool


@functools.lru_cache(maxsize=32)
def _pair_lists(parents, geom_body, geom_type, contype, conaffinity, excludes):
    """Static collidable pair lists grouped by type combo.

    Returns dict with 'cc' (capsule/sphere-capsule/sphere), 'cb'
    (capsule/sphere-box, round first), 'bb' (box-box) index arrays.
    """
    n = len(geom_type)
    exset = set(excludes)

    def body_filter(b1, b2):
        if b1 == b2:
            return False
        if parents[b1] == b2 or parents[b2] == b1:
            return False  # MuJoCo filterparent
        if (min(b1, b2), max(b1, b2)) in exset:
            return False
        return True

    cc, cb, bb = [], [], []
    for i in range(n):
        for j in range(i + 1, n):
            b1, b2 = geom_body[i], geom_body[j]
            if not body_filter(b1, b2):
                continue
            if not ((contype[i] & conaffinity[j]) or (contype[j] & conaffinity[i])):
                continue
            ti, tj = geom_type[i], geom_type[j]
            round_i = ti in (GEOM_CAPSULE, GEOM_SPHERE)
            round_j = tj in (GEOM_CAPSULE, GEOM_SPHERE)
            if round_i and round_j:
                cc.append((i, j))
            elif round_i and tj == GEOM_BOX:
                cb.append((i, j))
            elif ti == GEOM_BOX and round_j:
                cb.append((j, i))  # round geom first
            else:
                bb.append((i, j))
    to_np = lambda x: np.asarray(x, dtype=np.int32).reshape(-1, 2)
    return {"cc": to_np(cc), "cb": to_np(cb), "bb": to_np(bb)}


def _geom_world(model: RobotModel, kin: Kin, gidx: jax.Array):
    """World pose of geoms: center position and rotation matrix."""
    body = jnp.asarray(np.asarray(model.geom_body, np.int32))[gidx]
    Rb = kin.xmat[body]
    pos = kin.xpos[body] + jnp.einsum("...ij,...j->...i", Rb, model.geom_pos[gidx])
    Rg = Rb @ T.quat_to_matrix(model.geom_quat[gidx])
    return pos, Rg, body


def _segment(model, kin, gidx):
    """Capsule/sphere as a segment (p1,p2) + radius (spheres: p1==p2)."""
    pos, Rg, body = _geom_world(model, kin, gidx)
    size = model.geom_size[gidx]
    is_cap = jnp.asarray(
        np.asarray([t == GEOM_CAPSULE for t in model.geom_type], np.float32)
    )[gidx].astype(pos.dtype)
    half = (size[..., 1] * is_cap)[..., None] * Rg[..., :, 2]
    return pos - half, pos + half, size[..., 0], body


def _seg_seg_closest(p1, q1, p2, q2, eps=1e-12):
    """Closest points between segments [p1,q1], [p2,q2] (branch-free clamp).

    Returns (c1, c2, parallel_flag). Standard Ericson RTCD 5.1.9 algorithm.
    """
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    parallel = denom < eps * a * e + eps
    s = jnp.where(parallel, 0.0, jnp.clip((b * f - c * e) / jnp.where(parallel, 1.0, denom), 0.0, 1.0))
    t = (b * s + f) / jnp.maximum(e, eps)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, eps), 0.0, 1.0)
    c1 = p1 + s[..., None] * d1
    c2 = p2 + t_cl[..., None] * d2
    return c1, c2, parallel


def _box_sdf(p_local, half):
    """Signed distance + outward normal of a box (local frame), (...,3)."""
    q = jnp.abs(p_local) - half
    outside = jnp.maximum(q, 0.0)
    d_out = jnp.linalg.norm(outside, axis=-1)
    dist = d_out + jnp.minimum(jnp.max(q, axis=-1), 0.0)
    sgn = jnp.where(p_local >= 0, 1.0, -1.0)
    n_out = sgn * outside / jnp.maximum(d_out, 1e-12)[..., None]
    n_in = sgn * jax.nn.one_hot(jnp.argmax(q, axis=-1), 3, dtype=p_local.dtype)
    n = jnp.where((d_out > 0)[..., None], n_out, n_in)
    return dist, n


def capsule_box_contacts(lp, lq, half, r, margin):
    """MuJoCo-exact capsule-box narrowphase (box frame). Two contact slots.

    Semantics reverse-engineered from mujoco 3.10 (tools/probe_capsulebox.py):
      * PRIMARY contact: the sphere of radius r at the global minimizer of
        the box SDF along the segment. The minimizer is found in closed
        form: the SDF restricted to the segment is piecewise
        quadratic-root/linear between the parameters where a coordinate
        crosses +-half, so the global minimum is at an interval vertex, a
        pairwise crossing (interior), a breakpoint, or an endpoint — a
        fixed candidate set evaluated exactly (the r1 golden-section search
        had ~1e-7 position noise, which the stiff contact aref amplified to
        ~1e-3 qacc errors vs MuJoCo).
      * SECONDARY contact (capsule lying along a face): at segment
        parameter t2 = eta * (t_exit (1 + s^2) - w_c s) measured from the
        capsule center, where t_exit is the 2-D exit of the center's
        face-projection ray through the face rectangle on the ascending
        side, s = |axis . face normal|, w_c = center height above the face
        (machine-exact fit across r/halflen/box-size/tilt sweeps; see
        tools/probe_capsulebox.py). Emitted iff its own dist < margin —
        matching the observed disappearance of the second contact as tilt
        grows, with no explicit angle threshold.

    Inputs: lp, lq (..., 3) segment endpoints in the box frame; half
    (..., 3); r, margin (...). Returns dist (..., 2), pos (..., 2, 3),
    normal (..., 2, 3) (from the capsule toward the box, box frame).
    """
    dtype = lp.dtype
    d = lq - lp
    seg_len2 = jnp.sum(d * d, axis=-1)

    # ---- candidate parameters: breakpoints where a coordinate crosses
    # +-half, per-interval quadratic vertices, interior pairwise crossings
    safe_d = jnp.where(jnp.abs(d) > 1e-12, d, 1.0)
    t_hi = jnp.where(jnp.abs(d) > 1e-12, (half - lp) / safe_d, -1.0)
    t_lo = jnp.where(jnp.abs(d) > 1e-12, (-half - lp) / safe_d, -1.0)
    brk = jnp.concatenate([t_lo, t_hi], axis=-1)             # (...,6)
    brk = jnp.clip(brk, 0.0, 1.0)
    zero = jnp.zeros_like(brk[..., :1])
    ts = jnp.sort(
        jnp.concatenate([zero, zero + 1.0, brk], axis=-1), axis=-1
    )                                                        # (...,8)
    ta, tb = ts[..., :-1], ts[..., 1:]                       # (...,7)
    tm = 0.5 * (ta + tb)

    # sign/outside pattern per interval at its midpoint
    x_m = lp[..., None, :] + tm[..., :, None] * d[..., None, :]   # (...,7,3)
    sgn = jnp.where(x_m >= 0, 1.0, -1.0)
    out = jnp.abs(x_m) > half[..., None, :]

    # exterior quadratic vertex: minimize sum_out (lp + t d - sgn*half)^2
    e = lp[..., None, :] - sgn * half[..., None, :]               # (...,7,3)
    A2 = jnp.sum(jnp.where(out, d[..., None, :] ** 2, 0.0), axis=-1)
    B2 = jnp.sum(jnp.where(out, d[..., None, :] * e, 0.0), axis=-1)
    t_vert = jnp.where(A2 > 1e-18, -B2 / jnp.maximum(A2, 1e-18), tm)
    t_vert = jnp.clip(t_vert, ta, tb)                             # (...,7)

    # interior pairwise crossings of f_i(t) = sgn_i(lp_i + t d_i) - h_i
    # f_i = g_i + t k_i with g = sgn*lp - half, k = sgn*d
    g = sgn * lp[..., None, :] - half[..., None, :]
    k = sgn * d[..., None, :]
    pairs = ((0, 1), (0, 2), (1, 2))
    t_cross = []
    for i, j in pairs:
        dk = k[..., i] - k[..., j]
        tc = jnp.where(
            jnp.abs(dk) > 1e-14,
            (g[..., j] - g[..., i]) / jnp.where(jnp.abs(dk) > 1e-14, dk, 1.0),
            tm,
        )
        t_cross.append(jnp.clip(tc, ta, tb))
    t_cross = jnp.stack(t_cross, axis=-1).reshape(*ta.shape[:-1], -1)

    cand = jnp.concatenate([ts, t_vert, t_cross], axis=-1)        # (...,8+7+21)

    def sdf_at(t):
        pt = lp[..., None, :] + t[..., :, None] * d[..., None, :]
        dist, n = _box_sdf(pt, half[..., None, :])
        return dist, n, pt

    dist_c, _, _ = sdf_at(cand)
    best = jnp.argmin(dist_c, axis=-1)
    t1 = jnp.take_along_axis(cand, best[..., None], axis=-1)[..., 0]
    d1s, n1, p1 = sdf_at(t1[..., None])
    d1s, n1, p1 = d1s[..., 0], n1[..., 0, :], p1[..., 0, :]
    dist1 = d1s - r
    nrm1 = -n1                       # from capsule toward box
    pos1 = p1 + (r + 0.5 * dist1)[..., None] * nrm1

    # ---- secondary (parallel-to-face) contact
    axis = d / jnp.sqrt(jnp.maximum(seg_len2, 1e-24))[..., None]
    hl = 0.5 * jnp.sqrt(jnp.maximum(seg_len2, 1e-24))
    center = 0.5 * (lp + lq)
    kface = jnp.argmax(jnp.abs(n1), axis=-1)                      # face axis
    fsgn = jnp.sign(
        jnp.take_along_axis(n1, kface[..., None], axis=-1)[..., 0]
    )
    fsgn = jnp.where(fsgn == 0, 1.0, fsgn)
    nhat = fsgn[..., None] * jax.nn.one_hot(kface, 3, dtype=dtype)
    s_ax = jnp.sum(axis * nhat, axis=-1)
    eta = jnp.where(s_ax >= 0, 1.0, -1.0).astype(dtype)           # ascending dir
    s = jnp.abs(s_ax)
    u2d = axis - s_ax[..., None] * nhat                           # in-face dir
    c2d = jnp.sqrt(jnp.maximum(jnp.sum(u2d * u2d, axis=-1), 1e-24))
    dir2d = eta[..., None] * u2d / c2d[..., None]
    h_k = jnp.sum(half * jnp.abs(nhat), axis=-1)
    w_c = jnp.sum(center * nhat, axis=-1) - h_k
    # 2-D ray-rectangle exit from the center's face projection
    p2 = center - jnp.sum(center * nhat, axis=-1)[..., None] * nhat
    face_mask = 1.0 - jnp.abs(nhat)
    safe_dir = jnp.where(jnp.abs(dir2d) > 1e-12, dir2d, 1.0)
    lpos = jnp.where(
        (jnp.abs(dir2d) > 1e-12) & (face_mask > 0.5),
        (jnp.sign(dir2d) * half - p2) / safe_dir,
        jnp.inf,
    )
    L_exit = jnp.min(lpos, axis=-1)                               # 2-D arclen
    L_exit = jnp.maximum(L_exit, 0.0)
    t_exit = L_exit / jnp.maximum(c2d, 1e-12)
    t2 = eta * (t_exit * (1.0 + s * s) - w_c * s)
    t2 = jnp.clip(t2, -hl, hl)
    P2 = center + t2[..., None] * axis
    w2 = jnp.sum(P2 * nhat, axis=-1) - h_k
    dist2 = w2 - r
    nrm2 = -nhat
    pos2 = P2 + (r + 0.5 * dist2)[..., None] * nrm2
    # secondary invalid when degenerate (zero-length segment = sphere,
    # axis along the face normal), the exit is unbounded, or the primary
    # is an edge/corner contact (probed: MuJoCo emits the lying-pose
    # second contact only when the primary is face-dominated; edge-lean
    # configs get a single contact). Known approximation: a rare deep
    # edge-contact branch in MuJoCo duplicates the primary instead.
    n1_dom = jnp.max(jnp.abs(n1), axis=-1) / jnp.sqrt(
        jnp.maximum(jnp.sum(n1 * n1, axis=-1), 1e-24)
    )
    bad2 = (
        (c2d < 1e-9)
        | ~jnp.isfinite(L_exit)
        | (seg_len2 < 1e-20)
        | (n1_dom < 0.9)
    )
    dist2 = jnp.where(bad2, jnp.full_like(dist2, 1e9), dist2)

    dist = jnp.stack([dist1, dist2], axis=-1)
    pos = jnp.stack([pos1, pos2], axis=-2)
    normal = jnp.stack([nrm1, nrm2], axis=-2)
    return dist, pos, normal


@jax.custom_batching.custom_vmap
def _capsule_box_op(lp, lq, half, r):
    """Per-env capsule-box narrowphase over P pairs. Under the engine's env
    vmap the batched rule reroutes to the lanes-last formulation
    (physics/capsulebox_lanes.py) — full lane utilization instead of 3-wide
    minor dims."""
    return capsule_box_contacts(lp, lq, half, r, None)


@_capsule_box_op.def_vmap
def _capsule_box_vmap(axis_size, in_batched, lp, lq, half, r):
    from smplsim_tpu.physics import capsulebox_lanes

    def bc(x, batched):
        return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

    lp, lq, half, r = (
        bc(x, b) for x, b in zip((lp, lq, half, r), in_batched)
    )
    B, P = r.shape
    N = B * P
    tv = lambda x: jnp.moveaxis(x.reshape((N,) + x.shape[2:]), 0, -1)
    dd, pp, nn = capsulebox_lanes.capsule_box_lanes(
        tv(lp), tv(lq), tv(half), r.reshape(N)
    )
    dist = jnp.moveaxis(dd, -1, 0).reshape(B, P, 2)
    pos = jnp.moveaxis(pp, -1, 0).reshape(B, P, 2, 3)
    nrm = jnp.moveaxis(nn, -1, 0).reshape(B, P, 2, 3)
    return (dist, pos, nrm), (True, True, True)


@jax.custom_jvp
def capsule_box_op(lp, lq, half, r):
    return _capsule_box_op(lp, lq, half, r)


@capsule_box_op.defjvp
def _capsule_box_jvp(primals, tangents):
    # differentiate the reference path (plain ops); iLQR-scale workloads only
    return jax.jvp(
        lambda a, b, c, d: capsule_box_contacts(a, b, c, d, None),
        primals, tangents,
    )


_BB_SLOTS = 25  # 16 border crossings + 4 rect/partner corners + 4 quad corners + 1 raw clcorner


def _box_box_one(p1, R1, h1, p2, R2, h2, margin):
    """mjc_BoxBox-exact manifold for one pair. Returns
    (dist (25,), pos (25,3), normal (25,3), active (25,)).

    Algorithm decoded from the libmujoco 3.10 disassembly + probes
    (tools/boxbox_asm_notes.md; tools/verify_boxbox_hypotheses.py scores
    it 1072/1072 on face-case configs and ~95% on edge-code configs,
    residuals being near-duplicate boundary crossings):

      * SAT in probe order (box1 faces, box2 faces, 9 edge crosses); a
        later axis wins only by a RELATIVE (1-1e-12) margin.
      * FACE codes: 2-D frame ON the winning (reference) face; the other
        box's most anti-aligned face is the incident face, its corners
        projected along the REFERENCE normal. Per-incident-axis in-plane
        test |axis . n| < 0.5 (the 30-deg regime threshold) selects 4/1/0
        clip lines; candidates in slot order = per-line border crossings,
        contained reference-rect corners (2-in-plane regime), inside-rect
        incident corners, then the RAW deepest corner (clcorner, selected
        by sign bits with strict-> tie breaks) LAST.
      * EDGE codes: both support-face quads projected PERPENDICULAR to
        the axis; candidates = pairwise edge crossings + each quad's
        corners inside the other.
      * keep depth <= margin; pos = plane point + 0.5*depth*normal;
        mju_outsideBox(1.01, size+margin) drop rule; exact dedup keeping
        the lowest slot; emit only the FIRST 8 survivors (output cap).
    """
    dtype = p1.dtype
    t = p2 - p1
    big = jnp.asarray(1e9, dtype)

    # ---- SAT, probe order with relative (1-1e-12) preference
    fa = jnp.concatenate([R1.T, R2.T], axis=0)              # (6,3) rows
    pen_f = (jnp.abs(fa @ R1) @ h1 + jnp.abs(fa @ R2) @ h2
             - jnp.abs(fa @ t))                             # (6,)
    cross = jnp.cross(R1.T[:, None, :], R2.T[None, :, :]).reshape(9, 3)
    cn = jnp.linalg.norm(cross, axis=-1)
    good = cn > 1e-15
    ea = cross / jnp.maximum(cn, 1e-15)[:, None]
    pen_e = jnp.where(
        good,
        jnp.abs(ea @ R1) @ h1 + jnp.abs(ea @ R2) @ h2 - jnp.abs(ea @ t),
        big,
    )
    pens = jnp.concatenate([pen_f, pen_e])                  # (15,)
    axes = jnp.concatenate([fa, ea], axis=0)                # (15,3)
    best = pens[0]
    code = jnp.zeros((), jnp.int32)
    for k in range(1, 15):
        better = pens[k] < best * (1.0 - 1e-12)
        best = jnp.where(better, pens[k], best)
        code = jnp.where(better, k, code)
    code_oh = jax.nn.one_hot(code, 15, dtype=dtype)
    raw = code_oh @ axes                                     # unoriented
    s = jnp.sign(raw @ t)
    s = jnp.where(s == 0, 1.0, s).astype(dtype)
    a = raw * s                                              # box1 -> box2
    use_edge = code >= 6
    ref_is_1 = code < 3

    loop = jnp.asarray(
        [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]], dtype
    )

    def pick(c1, c2):
        return jnp.where(ref_is_1, c1, c2)

    # =================== FACE-case manifold ===================
    rp = pick(p1, p2)
    rR = pick(R1, R2)
    rh = pick(h1, h2)
    ip_ = pick(p2, p1)
    iR = pick(R2, R1)
    ih = pick(h2, h1)
    rn = jnp.where(ref_is_1, 1.0, -1.0).astype(dtype) * a

    kref = jnp.clip(code, 0, 5) % 3
    koh = jax.nn.one_hot(kref, 3, dtype=dtype)
    koh1 = jnp.roll(koh, 1)
    koh2 = jnp.roll(koh, 2)
    mcol = rR @ koh
    sk = jnp.sign(mcol @ rn)
    sk = jnp.where(sk == 0, 1.0, sk).astype(dtype)
    mr = mcol * sk
    cr = rp + mr * (rh @ koh)
    hu = rh @ koh1
    hv = rh @ koh2
    eu = rR @ koh1
    ev = rR @ koh2

    idots = iR.T @ (-rn)
    ioh = jax.nn.one_hot(jnp.argmax(jnp.abs(idots)), 3, dtype=dtype)
    si = jnp.sign(idots @ ioh)
    si = jnp.where(si == 0, 1.0, si).astype(dtype)
    mi = (iR @ ioh) * si
    ci = ip_ + mi * (ih @ ioh)
    ioh1 = jnp.roll(ioh, 1)
    ioh2 = jnp.roll(ioh, 2)
    iu = (iR @ ioh1) * (ih @ ioh1)
    iv = (iR @ ioh2) * (ih @ ioh2)

    Ci = ci[None, :] + loop[:, 0:1] * iu[None, :] + loop[:, 1:2] * iv[None, :]
    rn_mr = rn @ mr
    rn_mr = jnp.where(jnp.abs(rn_mr) > 1e-12, rn_mr, 1e-12)
    lam = ((cr[None, :] - Ci) @ mr) / rn_mr
    Qi3 = Ci + lam[:, None] * rn[None, :]
    Q = jnp.stack([(Qi3 - cr) @ eu, (Qi3 - cr) @ ev], axis=-1)  # (4,2)
    D = (Ci - cr) @ mr                                          # (4,)

    # clcorner via the decoded sign-bit rule (strict > breaks ties)
    al = ((raw @ t) * jnp.where(ref_is_1, 1.0, -1.0).astype(dtype)) < 0
    bit_u = ((raw @ iu) > 0) != al
    bit_v = ((raw @ iv) > 0) != al
    su = jnp.where(bit_u, -1.0, 1.0).astype(dtype)
    sv = jnp.where(bit_v, -1.0, 1.0).astype(dtype)
    c0_oh = ((loop[:, 0] == su) & (loop[:, 1] == sv)).astype(dtype)  # (4,)

    in_u = (iu @ rn) ** 2 < 0.25 * (iu @ iu)
    in_v = (iv @ rn) ** 2 < 0.25 * (iv @ iv)
    n_in = in_u.astype(jnp.int32) + in_v.astype(jnp.int32)

    # adjacency permutations in loop order
    PU = jnp.asarray([[0, 1, 0, 0], [1, 0, 0, 0],
                      [0, 0, 0, 1], [0, 0, 1, 0]], dtype)  # adj along u
    PV = jnp.asarray([[0, 0, 0, 1], [0, 0, 1, 0],
                      [0, 1, 0, 0], [1, 0, 0, 0]], dtype)  # adj along v
    nb_oh = jnp.where(in_u, PU @ c0_oh, PV @ c0_oh)        # (4,)

    QA, QB = Q, jnp.roll(Q, -1, axis=0)
    DA, DB = D, jnp.roll(D, -1)
    # edge k connects corners k and (k+1)%4
    edge_both = ((c0_oh * jnp.roll(nb_oh, -1)) +
                 (nb_oh * jnp.roll(c0_oh, -1))) > 0.5
    line_act = jnp.where(
        n_in >= 2, jnp.ones(4, bool),
        jnp.where(n_in == 1, edge_both, jnp.zeros(4, bool)),
    )

    dvec = QB - QA                                          # (4,2)
    f_q, f_d, f_act = [], [], []
    for axis, lim, olim in ((0, hu, hv), (1, hv, hu)):
        for sgn in (1.0, -1.0):
            den = dvec[:, axis]
            ok = jnp.abs(den) > 1e-15
            tt = (sgn * lim - QA[:, axis]) / jnp.where(ok, den, 1.0)
            q = QA + tt[:, None] * dvec                     # (4,2)
            act = (line_act & ok & (tt >= 0.0) & (tt <= 1.0)
                   & (jnp.abs(q[:, 1 - axis]) <= olim))
            f_q.append(q)
            f_d.append(DA + tt * (DB - DA))
            f_act.append(act)
    # slot order: edge-major, border order (u+, u-, v+, v-) within edge
    fq = jnp.stack(f_q, axis=1).reshape(16, 2)              # (4,4,2)->(16,2)
    fd = jnp.stack(f_d, axis=1).reshape(16)
    fact = jnp.stack(f_act, axis=1).reshape(16)

    # contained reference-rect corners (2-in-plane regime only)
    q0 = c0_oh @ Q
    D0 = c0_oh @ D
    qu = (PU @ c0_oh) @ Q
    qv = (PV @ c0_oh) @ Q
    Du = (PU @ c0_oh) @ D - D0
    Dv = (PV @ c0_oh) @ D - D0
    U, V = qu - q0, qv - q0
    det = U[0] * V[1] - U[1] * V[0]
    det_ok = jnp.abs(det) > 1e-15
    det_s = jnp.where(det_ok, det, 1.0)
    rc_q, rc_d, rc_act = [], [], []
    for su_ in (1.0, -1.0):
        for sv_ in (1.0, -1.0):
            rc = jnp.stack([su_ * hu, sv_ * hv])
            w = rc - q0
            aa = (w[0] * V[1] - w[1] * V[0]) / det_s
            bb = (U[0] * w[1] - U[1] * w[0]) / det_s
            rc_q.append(rc)
            rc_d.append(D0 + aa * Du + bb * Dv)
            rc_act.append(
                (n_in >= 2) & det_ok
                & (aa >= 0.0) & (aa <= 1.0) & (bb >= 0.0) & (bb <= 1.0)
            )
    rcq = jnp.stack(rc_q)
    rcd = jnp.stack(rc_d)
    rcact = jnp.stack(rc_act)

    # incident quad corners, inside-rect gated
    inside_rect = (jnp.abs(Q[:, 0]) <= hu) & (jnp.abs(Q[:, 1]) <= hv)
    allowed = jnp.where(
        n_in >= 2, jnp.ones(4, bool),
        jnp.where(n_in == 1, nb_oh > 0.5, jnp.zeros(4, bool)),
    )
    qc_act = inside_rect & allowed

    # face-case candidate arrays in slot order (25,)
    face_q = jnp.concatenate([fq, rcq, Q, q0[None, :]], axis=0)
    face_d = jnp.concatenate([fd, rcd, D, D0[None]], axis=0)
    face_act = jnp.concatenate(
        [fact, rcact, qc_act, jnp.ones(1, bool)], axis=0
    )
    face_pos = (cr[None, :] + face_q[:, 0:1] * eu[None, :]
                + face_q[:, 1:2] * ev[None, :]
                + 0.5 * face_d[:, None] * mr[None, :])

    # =================== EDGE-case manifold ===================
    def support_face(p, R, h, toward):
        dots = R.T @ toward
        kk = jnp.argmax(jnp.abs(dots))
        oh = jax.nn.one_hot(kk, 3, dtype=dtype)
        sg = jnp.sign(dots @ oh)
        sg = jnp.where(sg == 0, 1.0, sg).astype(dtype)
        m = (R @ oh) * sg
        c = p + m * (h @ oh)
        oh1 = jnp.roll(oh, 1)
        oh2 = jnp.roll(oh, 2)
        fu = (R @ oh1) * (h @ oh1)
        fv = (R @ oh2) * (h @ oh2)
        corners = (c[None, :] + loop[:, 0:1] * fu[None, :]
                   + loop[:, 1:2] * fv[None, :])
        return corners, c, m, oh, sg

    C1e, c1p, m1, oh1f, sg1f = support_face(p1, R1, h1, a)
    C2e, c2p, m2, _, _ = support_face(p2, R2, h2, -a)
    seed = jnp.where(
        jnp.abs(a[2]) > 0.9,
        jnp.asarray([0.0, 1.0, 0.0], dtype),
        jnp.asarray([0.0, 0.0, 1.0], dtype),
    )
    ue = seed - (seed @ a) * a
    ue = ue / jnp.maximum(jnp.linalg.norm(ue), 1e-12)
    ve = jnp.cross(a, ue)
    O = p1
    to2d = lambda P: jnp.stack([(P - O) @ ue, (P - O) @ ve], axis=-1)
    Q1 = to2d(C1e)
    Q2 = to2d(C2e)
    am1 = a @ m1
    am2 = a @ m2
    am1 = jnp.where(jnp.abs(am1) > 1e-12, am1, 1e-12)
    am2 = jnp.where(jnp.abs(am2) > 1e-12, am2, 1e-12)

    def alpha(xy, cp, m, am):
        return ((cp - O) @ m - xy[..., 0] * (ue @ m)
                - xy[..., 1] * (ve @ m)) / am

    def depth_at(xy):
        return alpha(xy, c2p, m2, am2) - alpha(xy, c1p, m1, am1)

    A1 = jnp.repeat(Q1, 4, axis=0)                          # (16,2)
    B1 = jnp.repeat(jnp.roll(Q1, -1, 0), 4, axis=0)
    A2 = jnp.tile(Q2, (4, 1))
    B2 = jnp.tile(jnp.roll(Q2, -1, 0), (4, 1))
    d1 = B1 - A1
    d2 = B2 - A2
    den = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    den_ok = jnp.abs(den) >= 1e-14
    den_s = jnp.where(den_ok, den, 1.0)
    w0 = A2 - A1
    tt = (w0[:, 0] * d2[:, 1] - w0[:, 1] * d2[:, 0]) / den_s
    ss = (w0[:, 0] * d1[:, 1] - w0[:, 1] * d1[:, 0]) / den_s
    xpt = A1 + tt[:, None] * d1
    xact = den_ok & (tt >= 0.0) & (tt <= 1.0) & (ss >= 0.0) & (ss <= 1.0)

    def inside(pts, quad):
        e = jnp.roll(quad, -1, 0) - quad
        rel = pts[:, None, :] - quad[None, :, :]
        cz = e[None, :, 0] * rel[..., 1] - e[None, :, 1] * rel[..., 0]
        return jnp.all(cz >= -1e-12, axis=1) | jnp.all(cz <= 1e-12, axis=1)

    c1in = inside(Q1, Q2)
    c2in = inside(Q2, Q1)
    # AT MOST ONE box1-face corner: the first inside one in mjc_BoxBox's
    # canonical rotmore enumeration. The per-reference-face slot order was
    # decoded empirically (tools/test_edge_rule.py + the (kax,sign)-grouped
    # probe sweep: 100% on tilt families, 99.5% on fully random configs;
    # the only residuals are one extra point at >50% interpenetration).
    # PRIO[kax][sign][slot]: higher = earlier in the enumeration; slots in
    # the support-face loop order [--, +-, ++, -+] over axes (k+1,k+2)%3.
    PRIO = jnp.asarray(
        [[[2.0, 1.0, 3.0, 4.0], [4.0, 3.0, 1.0, 2.0]],
         [[3.0, 4.0, 2.0, 1.0], [4.0, 3.0, 1.0, 2.0]],
         [[4.0, 2.0, 1.0, 3.0], [2.0, 4.0, 3.0, 1.0]]], dtype)
    sgsel = jnp.stack([(sg1f > 0).astype(dtype), (sg1f <= 0).astype(dtype)])
    prio = jnp.einsum("k,s,ksl->l", oh1f, sgsel, PRIO)
    score = jnp.where(c1in, prio, 0.0)
    c1pick = jax.nn.one_hot(jnp.argmax(score), 4, dtype=dtype)
    c1_q = c1pick @ Q1
    c1_act = jnp.any(c1in)
    # slot order: 16 crossings, 4 box2 corners, the 1 box1 corner, 4 pads
    edge_q = jnp.concatenate(
        [xpt, Q2, c1_q[None, :], jnp.zeros((4, 2), dtype)], axis=0
    )
    edge_act = jnp.concatenate(
        [xact, c2in, c1_act[None], jnp.zeros(4, bool)], axis=0
    )
    edge_d = depth_at(edge_q)
    edge_al1 = alpha(edge_q, c1p, m1, am1)
    edge_pos = (O[None, :] + edge_q[:, 0:1] * ue[None, :]
                + edge_q[:, 1:2] * ve[None, :]
                + (edge_al1 + 0.5 * edge_d)[:, None] * a[None, :])

    # =================== select + shared filters ===================
    dep = jnp.where(use_edge, edge_d, face_d)
    pos = jnp.where(use_edge, edge_pos, face_pos)
    act = jnp.where(use_edge, edge_act, face_act)
    act = act & (dep <= margin)

    # mju_outsideBox(1.01) drop rule: drop a point clearly outside one
    # margin-inflated box unless strictly inside the other
    def outside_flags(p, R, h):
        loc = (pos - p[None, :]) @ R                        # (25,3)
        hs = (h + margin)[None, :]
        strict_in = jnp.all(jnp.abs(loc) <= hs / 1.01, axis=-1)
        out = jnp.any(jnp.abs(loc) > hs * 1.01, axis=-1)
        return strict_in, out
    in1, out1 = outside_flags(p1, R1, h1)
    in2, out2 = outside_flags(p2, R2, h2)
    act = act & ~((out1 & ~in2) | (out2 & ~in1))

    # exact dedup, keep lowest slot
    diff = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    same = (diff < 1e-9) & act[:, None] & act[None, :]
    act = act & ~jnp.any(jnp.tril(same, k=-1), axis=1)

    # output cap: the FIRST 8 surviving candidates in slot order
    act = act & (jnp.cumsum(act.astype(jnp.int32)) <= 8)

    normal = jnp.broadcast_to(a, (_BB_SLOTS, 3))
    return dep, pos, normal, act


def _box_box_pairs_op(pos1, R1, h1, pos2, R2, h2, margin):
    """Per-env box-box manifolds over P pairs (plain vmap of the decoded
    mjc_BoxBox algorithm; BB_KEEP caps P, so the block stays small — the
    r2 lanes-last twin was retired with the algorithm rewrite and can be
    reinstated from git history if the TPU substep breakdown shows this
    block hot again)."""
    return jax.vmap(_box_box_one)(pos1, R1, h1, pos2, R2, h2, margin)


@jax.custom_jvp
def box_box_manifold_op(pos1, R1, h1, pos2, R2, h2, margin):
    return _box_box_pairs_op(pos1, R1, h1, pos2, R2, h2, margin)


@box_box_manifold_op.defjvp
def _box_box_manifold_jvp(primals, tangents):
    # differentiate the reference path (plain ops); iLQR-scale workloads only
    return jax.jvp(
        lambda *args: jax.vmap(_box_box_one)(*args), primals, tangents
    )


def _box_box_manifold(model, kin, g1, g2, margin):
    """Vectorized over pairs. Returns (dist (P,25), pos, normal, active,
    body1 (P,), body2 (P,))."""
    pos1, R1, bb1 = _geom_world(model, kin, g1)
    pos2, R2, bb2 = _geom_world(model, kin, g2)
    h1 = model.geom_size[g1]
    h2 = model.geom_size[g2]
    d, p, n, a = box_box_manifold_op(pos1, R1, h1, pos2, R2, h2, margin)
    return d, p, n, a, bb1, bb2


def _combine(model, g1, g2):
    """mj_collideGeoms pair combination: max friction, SUM of margins."""
    mu = jnp.maximum(model.geom_friction[g1, 0], model.geom_friction[g2, 0])
    margin = model.geom_margin[g1] + model.geom_margin[g2]
    return mu, margin


def _self_candidates_ref(model, kin, pl, keeps):
    """Per-env self-contact candidate arrays (reference path).

    `model`/`kin` may be lightweight namespaces carrying just the fields the
    geometry helpers read (geom_pos/quat/size/friction/margin + static
    geom_body/geom_type; kin.xpos/xmat). Returns the SELECTED top-MAX_SELF
    slots: (dist (S,), pos (S,3), normal (S,3), body1 (S,), body2 (S,),
    mu (S,), margin (S,), active (S,)).
    """
    dtype = kin.xpos.dtype
    cc_keep, cb_keep, bb_keep = keeps
    dists, poss, normals, b1s, b2s, mus, margins = [], [], [], [], [], [], []

    # ---- capsule/sphere vs capsule/sphere: 2 candidate slots per pair ----
    if len(pl["cc"]):
        g1 = jnp.asarray(pl["cc"][:, 0])
        g2 = jnp.asarray(pl["cc"][:, 1])
        p1, q1, r1, bb1 = _segment(model, kin, g1)
        p2, q2, r2, bb2 = _segment(model, kin, g2)
        mu_cc, margin_cc = _combine(model, g1, g2)  # static pair indices
        if len(pl["cc"]) > cc_keep:
            # conservative bounding-sphere cull (see the cb block below):
            # segment-center distance minus half-lengths minus radii is a
            # lower bound on the capsule-capsule distance
            c1c = 0.5 * (p1 + q1)
            c2c = 0.5 * (p2 + q2)
            h1c = 0.5 * jnp.linalg.norm(q1 - p1, axis=-1)
            h2c = 0.5 * jnp.linalg.norm(q2 - p2, axis=-1)
            d_low = (
                jnp.linalg.norm(c1c - c2c, axis=-1) - h1c - h2c - r1 - r2
            )
            from smplsim_tpu.physics.constraints import top_k_onehot

            _, koh = top_k_onehot(-d_low, cc_keep)
            keep = (koh @ jnp.arange(d_low.shape[0], dtype=dtype)
                    ).astype(jnp.int32)
            gath = lambda x: koh @ x if x.ndim == 1 else jnp.einsum(
                "kp,pi->ki", koh, x)
            p1, q1, r1 = gath(p1), gath(q1), gath(r1)
            p2, q2, r2 = gath(p2), gath(q2), gath(r2)
            mu_cc, margin_cc = gath(mu_cc), gath(margin_cc)
            bb1, bb2 = bb1[keep], bb2[keep]
        c1, c2, par = _seg_seg_closest(p1, q1, p2, q2)
        delta = c2 - c1
        gap = jnp.linalg.norm(delta, axis=-1)
        n = delta / jnp.maximum(gap, 1e-12)[..., None]
        dist = gap - r1 - r2
        pos = 0.5 * (c1 + r1[..., None] * n + c2 - r2[..., None] * n)
        mu, margin = mu_cc, margin_cc

        # parallel overlapping capsules: two contacts at the overlap ends
        # (project seg2 endpoints onto seg1's axis, clamp to seg1)
        d1 = q1 - p1
        len1sq = jnp.maximum(jnp.sum(d1 * d1, -1), 1e-12)
        t_a = jnp.clip(jnp.sum((p2 - p1) * d1, -1) / len1sq, 0.0, 1.0)
        t_b = jnp.clip(jnp.sum((q2 - p1) * d1, -1) / len1sq, 0.0, 1.0)
        for tt, other in ((t_a, p2), (t_b, q2)):
            c1p = p1 + tt[..., None] * d1
            # closest point on seg2 to c1p
            d2 = q2 - p2
            len2sq = jnp.maximum(jnp.sum(d2 * d2, -1), 1e-12)
            t2 = jnp.clip(jnp.sum((c1p - p2) * d2, -1) / len2sq, 0.0, 1.0)
            c2p = p2 + t2[..., None] * d2
            dd = c2p - c1p
            gg = jnp.linalg.norm(dd, axis=-1)
            nn = dd / jnp.maximum(gg, 1e-12)[..., None]
            dpar = gg - r1 - r2
            ppar = 0.5 * (c1p + r1[..., None] * nn + c2p - r2[..., None] * nn)
            dists.append(jnp.where(par, dpar, 1e9))
            poss.append(ppar)
            normals.append(nn)
            b1s.append(bb1)
            b2s.append(bb2)
            mus.append(mu)
            margins.append(margin)
        dists.append(jnp.where(par, 1e9, dist))
        poss.append(pos)
        normals.append(n)
        b1s.append(bb1)
        b2s.append(bb2)
        mus.append(mu)
        margins.append(margin)

    # ---- capsule/sphere vs box: exact narrowphase, 2 slots per pair ----
    if len(pl["cb"]):
        g1 = jnp.asarray(pl["cb"][:, 0])  # round geom
        g2 = jnp.asarray(pl["cb"][:, 1])  # box
        p1, q1, r1, bb1 = _segment(model, kin, g1)
        bpos, bR, bb2 = _geom_world(model, kin, g2)
        half = model.geom_size[g2]
        mu, margin = _combine(model, g1, g2)  # static pair indices
        # broadphase cull: the narrowphase dominates the substep at batch
        # scale, and a humanoid has at most a handful of capsule-box pairs
        # anywhere near contact. Keep the cb_keep closest pairs by a
        # CONSERVATIVE separation bound (center distance minus capsule
        # half-length+radius minus box bounding radius): pairs beyond the
        # bound cannot touch, so the cull is exact while #plausible <=
        # cb_keep (same capped-slots semantics as MAX_CONTACTS).
        if len(pl["cb"]) > cb_keep:
            center = 0.5 * (p1 + q1)
            seg_half = 0.5 * jnp.linalg.norm(q1 - p1, axis=-1)
            bound = jnp.linalg.norm(half, axis=-1)
            d_low = (
                jnp.linalg.norm(center - bpos, axis=-1)
                - seg_half - r1 - bound
            )
            from smplsim_tpu.physics.constraints import top_k_onehot

            _, koh = top_k_onehot(-d_low, cb_keep)
            keep = (koh @ jnp.arange(d_low.shape[0], dtype=dtype)
                    ).astype(jnp.int32)
            gath = lambda x: jnp.einsum("kp,p...->k...", koh, x)
            p1, q1, r1 = gath(p1), gath(q1), gath(r1)
            bpos, bR, half = gath(bpos), gath(bR), gath(half)
            mu, margin = gath(mu), gath(margin)
            bb1, bb2 = bb1[keep], bb2[keep]
        # to box frame
        to_local = lambda x: jnp.einsum("...ji,...j->...i", bR, x - bpos)
        lp, lq = to_local(p1), to_local(q1)
        d_cb, p_cb, n_cb = capsule_box_op(lp, lq, half, r1)
        # back to world
        p_w = bpos[..., None, :] + jnp.einsum("...ij,...kj->...ki", bR, p_cb)
        n_w = jnp.einsum("...ij,...kj->...ki", bR, n_cb)
        dists.append(d_cb.reshape(-1))
        poss.append(p_w.reshape(-1, 3))
        normals.append(n_w.reshape(-1, 3))
        b1s.append(jnp.repeat(bb1, 2))
        b2s.append(jnp.repeat(bb2, 2))
        mus.append(jnp.repeat(mu, 2))
        margins.append(jnp.repeat(margin, 2))

    # ---- box vs box: SAT manifold (mjc_BoxBox semantics, reverse-
    # engineered empirically — tools/analyze_boxbox.py / axis_rule_boxbox.py:
    # normal = min-penetration axis of 6 faces + 9 edge crosses, face axes
    # preferred within 1e-5 relative; face case emits the rect/quad
    # intersection-polygon vertices with per-point plane depth; edge case
    # emits the segment closest-point midpoint at the SAT depth) ----
    if len(pl["bb"]):
        g1 = jnp.asarray(pl["bb"][:, 0])
        g2 = jnp.asarray(pl["bb"][:, 1])
        pos1, R1, bb1 = _geom_world(model, kin, g1)
        pos2, R2, bb2 = _geom_world(model, kin, g2)
        h1 = model.geom_size[g1]
        h2 = model.geom_size[g2]
        mu, margin = _combine(model, g1, g2)  # static pair indices
        if len(pl["bb"]) > bb_keep:
            # conservative bounding-sphere cull (see the cb block above)
            bound = jnp.linalg.norm(h1, axis=-1) + jnp.linalg.norm(h2, axis=-1)
            d_low = jnp.linalg.norm(pos1 - pos2, axis=-1) - bound
            from smplsim_tpu.physics.constraints import top_k_onehot

            _, koh = top_k_onehot(-d_low, bb_keep)
            keep = (koh @ jnp.arange(d_low.shape[0], dtype=dtype)
                    ).astype(jnp.int32)
            gath = lambda x: jnp.einsum("kp,p...->k...", koh, x)
            pos1, R1, h1 = gath(pos1), gath(R1), gath(h1)
            pos2, R2, h2 = gath(pos2), gath(R2), gath(h2)
            mu, margin = gath(mu), gath(margin)
            bb1, bb2 = bb1[keep], bb2[keep]
        d_bb, p_bb, n_bb, act_bb = box_box_manifold_op(
            pos1, R1, h1, pos2, R2, h2, margin
        )
        d_bb = jnp.where(act_bb, d_bb, 1e9)
        # slot compaction: mjc_BoxBox caps output at 8 surviving points, so
        # the deepest 8 of the 25 candidate slots carry every real contact;
        # compacting before the cross-family top-k shrinks the ranking
        # problem ~2x (tie-order among equal depths may shuffle)
        from smplsim_tpu.physics.constraints import top_k_onehot as _tko
        _, soh8 = jax.vmap(lambda s: _tko(-s, 8))(d_bb)   # (P,8,25)
        d_bb = jnp.einsum("pqs,ps->pq", soh8, d_bb)
        p_bb = jnp.einsum("pqs,psi->pqi", soh8, p_bb)
        n_bb = jnp.einsum("pqs,psi->pqi", soh8, n_bb)
        S = d_bb.shape[1]  # slots per pair (8)
        dists.append(d_bb.reshape(-1))
        poss.append(p_bb.reshape(-1, 3))
        normals.append(n_bb.reshape(-1, 3))
        b1s.append(jnp.repeat(bb1, S))
        b2s.append(jnp.repeat(bb2, S))
        mus.append(jnp.repeat(mu, S))
        margins.append(jnp.repeat(margin, S))

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss)
    normal = jnp.concatenate(normals)
    b1 = jnp.concatenate(b1s)
    b2 = jnp.concatenate(b2s)
    mu = jnp.concatenate(mus)
    margin = jnp.concatenate(margins)

    # final depth-top-k selection (kept INSIDE the op so the lanes twin can
    # run it lanes-last and only MAX_SELF slots cross the vmap boundary)
    from smplsim_tpu.physics.constraints import top_k_onehot
    active_all = dist < margin
    score = jnp.where(active_all, -dist, -1e9)
    sval, soh = top_k_onehot(score, MAX_SELF)
    sel = (soh @ jnp.arange(dist.shape[0], dtype=dtype)).astype(jnp.int32)
    active = ((soh @ active_all.astype(dtype)) > 0.5) & (sval > -1e9 / 2)
    return (soh @ dist, soh @ pos, soh @ normal, b1[sel], b2[sel],
            soh @ mu, soh @ margin, active)


@functools.lru_cache(maxsize=32)
def _candidates_op(parents, geom_body, geom_type, contype, conaffinity,
                   excludes, keeps):
    """Build the (custom_jvp ∘ custom_vmap) candidates op for a topology.

    Same dispatch pattern as kinematics._fk_op_for: per-env calls (and all
    differentiation) run the reference family blocks above; under an env
    vmap the WHOLE candidate pipeline (world poses, culls, narrowphase,
    box-box manifold) runs the lanes-last twin in collision_lanes — full
    lane utilization instead of (B, P, 3) minor-dim tile waste. Model geom
    tables may be shared or per-env batched (β-heterogeneous stacks).
    """
    import types

    pl = _pair_lists(parents, geom_body, geom_type, contype, conaffinity,
                     excludes)
    meta = {
        "pairs": pl,
        "geom_body": np.asarray(geom_body, np.int32),
        "is_cap": np.asarray(
            [t == GEOM_CAPSULE for t in geom_type], np.float64),
    }

    def ref_path(xpos, xmat, gpos, gquat, gsize, gfric, gmarg):
        model_ns = types.SimpleNamespace(
            geom_body=geom_body, geom_type=geom_type, geom_pos=gpos,
            geom_quat=gquat, geom_size=gsize, geom_friction=gfric,
            geom_margin=gmarg)
        kin_ns = types.SimpleNamespace(xpos=xpos, xmat=xmat)
        return _self_candidates_ref(model_ns, kin_ns, pl, keeps)

    @jax.custom_batching.custom_vmap
    def _core(xpos, xmat, gpos, gquat, gsize, gfric, gmarg):
        return ref_path(xpos, xmat, gpos, gquat, gsize, gfric, gmarg)

    @_core.def_vmap
    def _core_vmap(axis_size, in_batched, *args):
        from smplsim_tpu.physics import collision_lanes as CL

        args = list(args)
        # kin arrays anchor the lane width; broadcast if unbatched
        for i in (0, 1):
            if not in_batched[i]:
                args[i] = jnp.broadcast_to(
                    args[i][None], (axis_size,) + args[i].shape)
        prepped = [jnp.moveaxis(x, 0, -1) if (i < 2 or in_batched[i]) else x
                   for i, x in enumerate(args)]
        outs = CL.self_candidates_lanes(meta, *prepped, keeps)
        return outs, (True,) * len(outs)

    @jax.custom_jvp
    def _op(*args):
        return _core(*args)

    @_op.defjvp
    def _op_jvp(primals, tangents):
        # differentiate the reference path (plain ops) — iLQR jacfwds
        return jax.jvp(ref_path, primals, tangents)

    return _op


def self_contacts(model: RobotModel, kin: Kin) -> SelfContacts:
    """All body-body contact candidates, top-MAX_SELF selected by depth."""
    dtype = kin.xpos.dtype
    contype = model.geom_contype or tuple(7 for _ in model.geom_type)
    conaffinity = model.geom_conaffinity or tuple(1 for _ in model.geom_type)
    pl = _pair_lists(model.parents, model.geom_body, model.geom_type,
                     contype, conaffinity, model.contact_excludes)
    if not (len(pl["cc"]) or len(pl["cb"]) or len(pl["bb"])):
        # no collidable pairs in this model: all slots inactive
        return SelfContacts(
            dist=jnp.full(MAX_SELF, 1e9, dtype),
            pos=jnp.zeros((MAX_SELF, 3), dtype),
            normal=jnp.zeros((MAX_SELF, 3), dtype).at[:, 2].set(1.0),
            body1=jnp.zeros(MAX_SELF, jnp.int32),
            body2=jnp.zeros(MAX_SELF, jnp.int32),
            friction=jnp.ones(MAX_SELF, dtype),
            margin=jnp.zeros(MAX_SELF, dtype),
            active=jnp.zeros(MAX_SELF, dtype=bool),
        )

    op = _candidates_op(model.parents, model.geom_body, model.geom_type,
                        contype, conaffinity, model.contact_excludes,
                        (CC_KEEP, CB_KEEP, BB_KEEP))
    dist, pos, normal, b1, b2, mu, margin, active = op(
        kin.xpos, kin.xmat, model.geom_pos, model.geom_quat,
        model.geom_size, model.geom_friction, model.geom_margin,
    )
    return SelfContacts(dist=dist, pos=pos, normal=normal, body1=b1,
                        body2=b2, friction=mu, margin=margin, active=active)
