"""Capsule-box narrowphase, batch-in-lanes formulation.

`collision_pairs.capsule_box_contacts` vmapped over (env, pair) produces op
chains on (B, P, 36, 3)-shaped arrays whose 3-wide minor dimension pads to
full (8,128) TPU tiles — the same ~40x bandwidth waste the box-box manifold
had before boxbox_lanes. This module is the SAME algorithm with the
flattened env*pair axis N as the MINOR dimension ((3,N), (36,N), (36,3,N)):
every op runs at full lane utilization.

Exposed through `collision_pairs.capsule_box_op` (custom_vmap): per-pair
calls use the reference routine; under the engine's env vmap the whole
batch lands here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

N_CAND = 8 + 7 + 21  # breakpoints + interval vertices + interior crossings


def _box_sdf_lanes(p, half):
    """Signed distance + outward normal of a box. p (..., 3, N), half (3, N)."""
    q = jnp.abs(p) - half
    out = jnp.maximum(q, 0.0)
    d_out = jnp.sqrt(jnp.sum(out * out, axis=-2))
    q_max = jnp.max(q, axis=-2)
    dist = d_out + jnp.minimum(q_max, 0.0)
    sgn = jnp.where(p >= 0, 1.0, -1.0)
    n_out = sgn * out / jnp.maximum(d_out, 1e-12)[..., None, :]
    inner = (q == q_max[..., None, :]).astype(p.dtype)
    # tie-break toward the first axis like argmax (match the reference path)
    first = jnp.cumsum(inner, axis=-2)
    inner = inner * (first == 1.0)
    n_in = sgn * inner
    n = jnp.where((d_out > 0)[..., None, :], n_out, n_in)
    return dist, n


def capsule_box_lanes(lp, lq, half, r):
    """All-lanes capsule-box. Inputs lp, lq, half (3,N); r (N,).
    Returns dist (2,N), pos (2,3,N), normal (2,3,N) — mirrors
    collision_pairs.capsule_box_contacts exactly (see its docstring for the
    MuJoCo semantics notes)."""
    dtype = lp.dtype
    N = lp.shape[-1]
    d = lq - lp                                          # (3,N)
    seg_len2 = jnp.sum(d * d, axis=0)                    # (N,)

    safe_d = jnp.where(jnp.abs(d) > 1e-12, d, 1.0)
    ok_d = jnp.abs(d) > 1e-12
    t_hi = jnp.where(ok_d, (half - lp) / safe_d, -1.0)   # (3,N)
    t_lo = jnp.where(ok_d, (-half - lp) / safe_d, -1.0)
    brk = jnp.clip(jnp.concatenate([t_lo, t_hi], axis=0), 0.0, 1.0)  # (6,N)
    zero = jnp.zeros((1, N), dtype)
    ts = jnp.sort(jnp.concatenate([zero, zero + 1.0, brk], axis=0), axis=0)
    ta, tb = ts[:-1], ts[1:]                             # (7,N)
    tm = 0.5 * (ta + tb)

    x_m = lp[None] + tm[:, None, :] * d[None]            # (7,3,N)
    sgn = jnp.where(x_m >= 0, 1.0, -1.0)
    out = jnp.abs(x_m) > half[None]

    e = lp[None] - sgn * half[None]                      # (7,3,N)
    A2 = jnp.sum(jnp.where(out, d[None] ** 2, 0.0), axis=1)   # (7,N)
    B2 = jnp.sum(jnp.where(out, d[None] * e, 0.0), axis=1)
    t_vert = jnp.where(A2 > 1e-18, -B2 / jnp.maximum(A2, 1e-18), tm)
    t_vert = jnp.clip(t_vert, ta, tb)

    g = sgn * lp[None] - half[None]                      # (7,3,N)
    k = sgn * d[None]
    cross = []
    for i, j in ((0, 1), (0, 2), (1, 2)):
        dk = k[:, i] - k[:, j]
        tc = jnp.where(
            jnp.abs(dk) > 1e-14,
            (g[:, j] - g[:, i]) / jnp.where(jnp.abs(dk) > 1e-14, dk, 1.0),
            tm,
        )
        cross.append(jnp.clip(tc, ta, tb))
    cand = jnp.concatenate([ts, t_vert] + cross, axis=0)  # (36,N)

    pt = lp[None] + cand[:, None, :] * d[None]            # (36,3,N)
    dist_c, _ = _box_sdf_lanes(pt, half)                  # (36,N)
    best = jnp.argmin(dist_c, axis=0)                     # (N,)
    t1 = jnp.take_along_axis(cand, best[None], axis=0)[0]  # (N,)
    p1 = lp + t1[None] * d                                # (3,N)
    d1s, n1 = _box_sdf_lanes(p1, half)
    dist1 = d1s - r
    nrm1 = -n1
    pos1 = p1 + (r + 0.5 * dist1)[None] * nrm1

    # ---- secondary (parallel-to-face) contact
    hl = 0.5 * jnp.sqrt(jnp.maximum(seg_len2, 1e-24))
    axis = d / (2.0 * hl[None])
    center = 0.5 * (lp + lq)
    kface = jnp.argmax(jnp.abs(n1), axis=0)               # (N,)
    kf1 = jax.nn.one_hot(kface, 3, dtype=dtype, axis=0)   # (3,N)
    fsgn = jnp.sign(jnp.sum(n1 * kf1, axis=0))
    fsgn = jnp.where(fsgn == 0, 1.0, fsgn)
    nhat = fsgn[None] * kf1
    s_ax = jnp.sum(axis * nhat, axis=0)
    eta = jnp.where(s_ax >= 0, 1.0, -1.0).astype(dtype)
    s = jnp.abs(s_ax)
    u2d = axis - s_ax[None] * nhat
    c2d = jnp.sqrt(jnp.maximum(jnp.sum(u2d * u2d, axis=0), 1e-24))
    dir2d = eta[None] * u2d / c2d[None]
    h_k = jnp.sum(half * jnp.abs(nhat), axis=0)
    w_c = jnp.sum(center * nhat, axis=0) - h_k
    p2 = center - jnp.sum(center * nhat, axis=0)[None] * nhat
    face_mask = 1.0 - jnp.abs(nhat)
    safe_dir = jnp.where(jnp.abs(dir2d) > 1e-12, dir2d, 1.0)
    lpos = jnp.where(
        (jnp.abs(dir2d) > 1e-12) & (face_mask > 0.5),
        (jnp.sign(dir2d) * half - p2) / safe_dir,
        jnp.inf,
    )
    L_exit = jnp.maximum(jnp.min(lpos, axis=0), 0.0)
    t_exit = L_exit / jnp.maximum(c2d, 1e-12)
    t2 = jnp.clip(eta * (t_exit * (1.0 + s * s) - w_c * s), -hl, hl)
    P2 = center + t2[None] * axis
    w2 = jnp.sum(P2 * nhat, axis=0) - h_k
    dist2 = w2 - r
    nrm2 = -nhat
    pos2 = P2 + (r + 0.5 * dist2)[None] * nrm2
    n1_dom = jnp.max(jnp.abs(n1), axis=0) / jnp.sqrt(
        jnp.maximum(jnp.sum(n1 * n1, axis=0), 1e-24)
    )
    bad2 = (
        (c2d < 1e-9)
        | ~jnp.isfinite(L_exit)
        | (seg_len2 < 1e-20)
        | (n1_dom < 0.9)
    )
    dist2 = jnp.where(bad2, jnp.full_like(dist2, 1e9), dist2)

    dist = jnp.stack([dist1, dist2], axis=0)              # (2,N)
    pos = jnp.stack([pos1, pos2], axis=0)                 # (2,3,N)
    normal = jnp.stack([nrm1, nrm2], axis=0)
    return dist, pos, normal
