"""Hypothesis E3 (from the mjc_BoxBox disassembly, lines 1752ce-1753de):
for an edge code (i,j), the clip machinery runs with
  reference face = box1's face along axis l* = argmax_{l != i} |rot[l][j]|
                   (sign toward box2),
  incident face  = box2's face along axis k* = argmax_{k != j} |rot[i][k]|
                   (sign anti-aligned with the reference normal),
with the incident corners OBLIQUELY projected along the contact normal
(the cross axis) onto the reference plane; depth measured along the
contact normal; in-plane regime / clcorner / slot order / filters exactly
as the decoded face case. Variants score the remaining sign/threshold
ambiguities."""
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from verify_boxbox_hypotheses import (  # noqa: E402
    mj_contacts, quat_mat, sat_axis, outside_box, match,
)


def edge_manifold_e3(p1, R1, h1, p2, R2, h2, margin, a, code, v):
    """v: dict of variant switches."""
    t = p2 - p1
    i_e, j_e = divmod(code - 12, 3)
    rot = R1.T @ R2                     # rot[l][k] = R1[:,l].R2[:,k]
    # reference face on box1
    ls = [l for l in range(3) if l != i_e]
    l_star = max(ls, key=lambda l: abs(rot[l][j_e]))
    sl = np.sign(t @ R1[:, l_star]) or 1.0
    mr = sl * R1[:, l_star]
    cr = p1 + mr * h1[l_star]
    l1, l2 = [x for x in range(3) if x != l_star]
    hu, hv = h1[l1], h1[l2]
    eu, ev = R1[:, l1], R1[:, l2]
    # incident face on box2
    ks = [k for k in range(3) if k != j_e]
    k_star = max(ks, key=lambda k: abs(rot[i_e][k]))
    sk = -(np.sign(mr @ R2[:, k_star]) or 1.0)
    mi = sk * R2[:, k_star]
    ci = p2 + mi * h2[k_star]
    k1, k2 = [x for x in range(3) if x != k_star]
    iu = R2[:, k1] * h2[k1]
    iv = R2[:, k2] * h2[k2]
    loop = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
    Ci = [ci + s0 * iu + s1 * iv for s0, s1 in loop]

    rn = a  # oriented contact normal (box1 -> box2)
    anm = rn @ mr
    if abs(anm) < 1e-12:
        return []

    def p2d(x3):
        lam = ((cr - x3) @ mr) / anm
        q = x3 + lam * rn
        return np.array([(q - cr) @ eu, (q - cr) @ ev])

    def dep(x3):
        # signed gap along the contact normal: distance the corner sits
        # past the reference plane, measured along rn
        return ((x3 - cr) @ mr) / anm if v["dep_axis"] else (x3 - cr) @ mr

    Q = [p2d(c) for c in Ci]
    D = [dep(c) for c in Ci]
    nrm_for_inplane = rn if v["inplane_axis"] else mr
    in_u = abs((iu / np.linalg.norm(iu)) @ nrm_for_inplane) < 0.5
    in_v = abs((iv / np.linalg.norm(iv)) @ nrm_for_inplane) < 0.5
    n_in = int(in_u) + int(in_v)
    raw = np.cross(R1[:, i_e], R2[:, j_e])
    al = (raw @ t) < 0

    def bit(col):
        return ((raw @ col) > 0) != al

    su = -1.0 if bit(iu) else 1.0
    sv = -1.0 if bit(iv) else 1.0
    i0 = loop.index((su, sv))
    adj_u = {0: 1, 1: 0, 2: 3, 3: 2}
    adj_v = {0: 3, 3: 0, 1: 2, 2: 1}
    if n_in >= 2:
        edges = [(k, (k + 1) % 4) for k in range(4)]
    elif n_in == 1:
        edges = [(i0, adj_u[i0] if in_u else adj_v[i0])]
    else:
        edges = []
    pts = []
    for ka, kb in edges:
        qa, qb = Q[ka], Q[kb]
        da, db = D[ka], D[kb]
        dvec = qb - qa
        for axis, lim in ((0, hu), (1, hv)):
            if abs(dvec[axis]) < 1e-15:
                continue
            for sgn in (1.0, -1.0):
                tt = (sgn * lim - qa[axis]) / dvec[axis]
                if tt < 0.0 or tt > 1.0:
                    continue
                q = qa + tt * dvec
                other = 1 - axis
                olim = hv if axis == 0 else hu
                if abs(q[other]) > olim:
                    continue
                pts.append((q, da + tt * (db - da)))
    if n_in >= 2:
        others = list(range(4))
    elif n_in == 1:
        others = [adj_u[i0] if in_u else adj_v[i0]]
    else:
        others = []
    for k in others:
        if abs(Q[k][0]) <= hu and abs(Q[k][1]) <= hv:
            pts.append((Q[k], D[k]))
    if n_in >= 2:
        q0, qu, qv = Q[i0], Q[adj_u[i0]], Q[adj_v[i0]]
        U, V = qu - q0, qv - q0
        det = U[0] * V[1] - U[1] * V[0]
        if abs(det) > 1e-15:
            for su_ in (1.0, -1.0):
                for sv_ in (1.0, -1.0):
                    rc = np.array([su_ * hu, sv_ * hv])
                    w = rc - q0
                    aa = (w[0] * V[1] - w[1] * V[0]) / det
                    bb = (U[0] * w[1] - U[1] * w[0]) / det
                    if 0.0 <= aa <= 1.0 and 0.0 <= bb <= 1.0:
                        du = D[adj_u[i0]] - D[i0]
                        dv_ = D[adj_v[i0]] - D[i0]
                        pts.append((rc, D[i0] + aa * du + bb * dv_))
    pts.append((Q[i0], D[i0]))
    out = []
    nrm_for_pos = rn if v["pos_axis"] else mr
    for q, d in pts:
        if d > margin:
            continue
        pos = cr + q[0] * eu + q[1] * ev + 0.5 * d * nrm_for_pos
        r1 = outside_box(pos, p1, R1, h1, margin)
        r2 = outside_box(pos, p2, R2, h2, margin)
        if (r1 == 1 and r2 != -1) or (r2 == 1 and r1 != -1):
            continue
        out.append((d, pos))
    ded = []
    for dth, pos in out:
        if not any(np.allclose(pos, p, atol=1e-12) for _, p in ded):
            ded.append((dth, pos))
    return ded[:8]


def gen_cfg(rng, fam):
    s1 = rng.uniform(0.03, 0.09, 3)
    s2 = rng.uniform(0.03, 0.09, 3)
    if fam == "random":
        q2 = rng.normal(size=4)
        q2 /= np.linalg.norm(q2)
        dirn = rng.normal(size=3)
        dirn /= np.linalg.norm(dirn)
        pos2 = dirn * rng.uniform(0.3, 1.0) * (s1 + s2).max()
    else:
        th = rng.uniform(0, np.pi / 3)
        yaw = rng.uniform(-0.3, 0.3)
        qx = np.array([np.cos(th / 2), np.sin(th / 2), 0, 0])
        w1, x1, y1, z1 = qx
        w2, x2, y2, z2 = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
        q2 = np.array([
            w1 * w2 - z1 * z2, x1 * w2 + y1 * z2,
            y1 * w2 - x1 * z2, z1 * w2 + w1 * z2,
        ])
        q2 /= np.linalg.norm(q2)
        pos2 = np.array([rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02),
                         s1[2] + s2[2] * rng.uniform(0.6, 1.0)])
    return s1, s2, q2, pos2


VARIANTS = [
    dict(name=f"dep{da}_in{ia}_pos{pa}", dep_axis=da, inplane_axis=ia,
         pos_axis=pa)
    for da in (1, 0) for ia in (1, 0) for pa in (1, 0)
]


def main():
    for fam, n, seed in (("tilt", 800, 0), ("random", 2000, 1)):
        rng = np.random.RandomState(seed)
        scores = {}
        bad = {}
        tot = 0
        for i in range(n):
            s1, s2, q2, pos2 = gen_cfg(rng, fam)
            p1, R1, h1 = np.zeros(3), np.eye(3), s1
            R2 = quat_mat(q2)
            a, pen, code = sat_axis(p1, R1, h1, pos2, R2, s2)
            if code < 12 or pen < -0.002:
                continue
            cons = mj_contacts(pos2, q2, s1, s2)
            if not cons:
                continue
            tot += 1
            for v in VARIANTS:
                pred = edge_manifold_e3(p1, R1, h1, pos2, R2, s2, 0.002, a,
                                        code, v)
                ok = match(cons, pred)
                st = scores.setdefault(v["name"], [0, 0])
                st[0] += int(bool(ok))
                st[1] += 1
                if not ok and len(bad.setdefault(v["name"], [])) < 10:
                    bad[v["name"]].append(i)
        print(f"[{fam}] edge-code configs: {tot}")
        for k, (hit, t) in sorted(scores.items(), key=lambda x: -x[1][0]):
            print(f"  {k}: {hit}/{t} = {hit/max(t,1):.3f}  bad={bad.get(k, [])[:10]}")


if __name__ == "__main__":
    main()
