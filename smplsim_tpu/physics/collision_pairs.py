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

MAX_SELF = 12


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


def _combine(model, g1, g2):
    """mj_collideGeoms pair combination: max friction, SUM of margins."""
    mu = jnp.maximum(model.geom_friction[g1, 0], model.geom_friction[g2, 0])
    margin = model.geom_margin[g1] + model.geom_margin[g2]
    return mu, margin


def self_contacts(model: RobotModel, kin: Kin) -> SelfContacts:
    """All body-body contact candidates, top-MAX_SELF selected by depth."""
    dtype = kin.xpos.dtype
    pl = _pair_lists(
        model.parents,
        model.geom_body,
        model.geom_type,
        model.geom_contype or tuple(7 for _ in model.geom_type),
        model.geom_conaffinity or tuple(1 for _ in model.geom_type),
        model.contact_excludes,
    )

    dists, poss, normals, b1s, b2s, mus, margins = [], [], [], [], [], [], []

    # ---- capsule/sphere vs capsule/sphere: 2 candidate slots per pair ----
    if len(pl["cc"]):
        g1 = jnp.asarray(pl["cc"][:, 0])
        g2 = jnp.asarray(pl["cc"][:, 1])
        p1, q1, r1, bb1 = _segment(model, kin, g1)
        p2, q2, r2, bb2 = _segment(model, kin, g2)
        c1, c2, par = _seg_seg_closest(p1, q1, p2, q2)
        delta = c2 - c1
        gap = jnp.linalg.norm(delta, axis=-1)
        n = delta / jnp.maximum(gap, 1e-12)[..., None]
        dist = gap - r1 - r2
        pos = 0.5 * (c1 + r1[..., None] * n + c2 - r2[..., None] * n)
        mu, margin = _combine(model, g1, g2)

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

    # ---- capsule/sphere vs box: SDF minimized along the segment ----
    if len(pl["cb"]):
        g1 = jnp.asarray(pl["cb"][:, 0])  # round geom
        g2 = jnp.asarray(pl["cb"][:, 1])  # box
        p1, q1, r1, bb1 = _segment(model, kin, g1)
        bpos, bR, bb2 = _geom_world(model, kin, g2)
        half = model.geom_size[g2]
        # to box frame
        to_local = lambda x: jnp.einsum("...ji,...j->...i", bR, x - bpos)
        lp, lq = to_local(p1), to_local(q1)

        def sdf_at(t):
            pt = lp + t[..., None] * (lq - lp)
            d, _ = _box_sdf(pt, half)
            return d

        # golden-section search on the (convex) SDF along the segment
        lo = jnp.zeros(lp.shape[0], dtype)
        hi = jnp.ones(lp.shape[0], dtype)
        for _ in range(24):
            m1 = lo + 0.382 * (hi - lo)
            m2 = lo + 0.618 * (hi - lo)
            keep_lo = sdf_at(m1) < sdf_at(m2)
            hi = jnp.where(keep_lo, m2, hi)
            lo = jnp.where(keep_lo, lo, m1)
        t_star = 0.5 * (lo + hi)
        pt_local = lp + t_star[..., None] * (lq - lp)
        d, n_local = _box_sdf(pt_local, half)
        dist = d - r1
        n_world = jnp.einsum("...ij,...j->...i", bR, n_local)  # box outward
        # normal from geom1 (round) toward geom2 (box) = -outward
        n = -n_world
        surf1 = p1 + t_star[..., None] * (q1 - p1) + r1[..., None] * n
        # box surface point along outward normal
        surf2 = p1 + t_star[..., None] * (q1 - p1) + (r1 + dist)[..., None] * n
        pos = 0.5 * (surf1 + surf2)
        mu, margin = _combine(model, g1, g2)
        dists.append(dist)
        poss.append(pos)
        normals.append(n)
        b1s.append(bb1)
        b2s.append(bb2)
        mus.append(mu)
        margins.append(margin)

    # ---- box vs box: corner-SDF candidates both directions ----
    if len(pl["bb"]):
        g1 = jnp.asarray(pl["bb"][:, 0])
        g2 = jnp.asarray(pl["bb"][:, 1])
        pos1, R1, bb1 = _geom_world(model, kin, g1)
        pos2, R2, bb2 = _geom_world(model, kin, g2)
        h1 = model.geom_size[g1]
        h2 = model.geom_size[g2]
        corners = jnp.asarray(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            dtype=dtype,
        )  # (8,3)
        mu, margin = _combine(model, g1, g2)

        def corner_contacts(pa, Ra, ha, pb, Rb_, hb, flip):
            # corners of A tested against B's SDF
            cw = pa[:, None, :] + jnp.einsum(
                "pij,cj->pci", Ra, corners
            ) * ha[:, None, :]  # (P,8,3)
            local = jnp.einsum("pji,pcj->pci", Rb_, cw - pb[:, None, :])
            d, n_local = _box_sdf(local, hb[:, None, :])
            n_world = jnp.einsum("pij,pcj->pci", Rb_, n_local)
            # outward normal of B points away from B; contact normal 1->2
            nrm = jnp.where(flip, n_world, -n_world)
            p_surf = cw - 0.5 * d[..., None] * n_world
            return d, p_surf, nrm

        dA, pA, nA = corner_contacts(pos1, R1, h1, pos2, R2, h2, flip=False)
        dB, pB, nB = corner_contacts(pos2, R2, h2, pos1, R1, h1, flip=True)
        for (dd, pp, nn) in ((dA, pA, nA), (dB, pB, nB)):
            P = dd.shape[0]
            dists.append(dd.reshape(-1))
            poss.append(pp.reshape(-1, 3))
            normals.append(nn.reshape(-1, 3))
            b1s.append(jnp.repeat(bb1, 8))
            b2s.append(jnp.repeat(bb2, 8))
            mus.append(jnp.repeat(mu, 8))
            margins.append(jnp.repeat(margin, 8))

    if not dists:
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

    dist = jnp.concatenate(dists)
    pos = jnp.concatenate(poss)
    normal = jnp.concatenate(normals)
    b1 = jnp.concatenate(b1s)
    b2 = jnp.concatenate(b2s)
    mu = jnp.concatenate(mus)
    margin = jnp.concatenate(margins)

    from smplsim_tpu.physics.constraints import top_k_pad
    active_all = dist < margin
    score = jnp.where(active_all, -dist, -1e9)
    sval, sel = top_k_pad(score, MAX_SELF)
    active_all = active_all[sel] & (sval > -1e9 / 2)
    return SelfContacts(
        dist=dist[sel],
        pos=pos[sel],
        normal=normal[sel],
        body1=b1[sel],
        body2=b2[sel],
        friction=mu[sel],
        margin=margin[sel],
        active=active_all,
    )
