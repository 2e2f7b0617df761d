"""Test: does mjc_BoxBox's edge-code branch reuse the face machinery with
a support-face reference? Score manifold_face(ref=box1 / ref=box2 / ref by
rule) on edge-code configs."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from verify_boxbox_hypotheses import (  # noqa: E402
    mj_contacts, quat_mat, sat_axis, support_face, outside_box, match,
)


def face_manifold(p1, R1, h1, p2, R2, h2, margin, a, raw, ref_is_1):
    """The decoded face-case pipeline, parameterized by reference box and
    the raw (unoriented) axis used for the clcorner sign bits."""
    (rp, rR, rh), (ip_, iR, ih) = (
        ((p1, R1, h1), (p2, R2, h2)) if ref_is_1 else ((p2, R2, h2), (p1, R1, h1))
    )
    rn = a if ref_is_1 else -a
    Cr, cr, mr, ru, rv = support_face(rp, rR, rh, rn)
    Ci, ci, mi, iu, iv = support_face(ip_, iR, ih, -mr)
    hu, hv = np.linalg.norm(ru), np.linalg.norm(rv)
    eu, ev = ru / hu, rv / hv

    def p2d(x3):
        lam = ((cr - x3) @ mr) / (rn @ mr) if abs(rn @ mr) > 1e-15 else 0.0
        q = x3 + lam * rn
        return np.array([(q - cr) @ eu, (q - cr) @ ev])

    def dep(x3):
        return (x3 - cr) @ mr

    Q = [p2d(c) for c in Ci]
    D = [dep(c) for c in Ci]
    in_u = abs((iu / np.linalg.norm(iu)) @ mr) < 0.5
    in_v = abs((iv / np.linalg.norm(iv)) @ mr) < 0.5
    n_in = int(in_u) + int(in_v)
    al = (raw @ (p2 - p1)) < 0 if ref_is_1 else (raw @ (p1 - p2)) < 0

    def bit(col):
        return ((raw @ col) > 0) != al

    su = -1.0 if bit(iu) else 1.0
    sv = -1.0 if bit(iv) else 1.0
    corner_idx = {(-1.0, -1.0): 0, (1.0, -1.0): 1, (1.0, 1.0): 2, (-1.0, 1.0): 3}
    i0 = corner_idx[(su, sv)]
    adj_u = {0: 1, 1: 0, 2: 3, 3: 2}
    adj_v = {0: 3, 3: 0, 1: 2, 2: 1}
    if n_in >= 2:
        edges = [(k, (k + 1) % 4) for k in range(4)]
    elif n_in == 1:
        nb = adj_u[i0] if in_u else adj_v[i0]
        edges = [(i0, nb)]
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
    for q, d in pts:
        if d > margin:
            continue
        pos = cr + q[0] * eu + q[1] * ev + 0.5 * d * mr
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


def main(n=2000, seed=1):
    rng = np.random.RandomState(seed)
    fam = os.environ.get("BB_FAMILY", "random")
    scores = {}
    tot = 0
    bad = []
    for i in range(n):
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
        p1, R1, h1 = np.zeros(3), np.eye(3), s1
        R2 = quat_mat(q2)
        a, pen, code = sat_axis(p1, R1, h1, pos2, R2, s2)
        if code < 12 or pen < -0.002:
            continue
        cons = mj_contacts(pos2, q2, s1, s2)
        if not cons:
            continue
        tot += 1
        i_e, j_e = divmod(code - 12, 3)
        raw = np.cross(R1[:, i_e], R2[:, j_e])
        for name, ref1 in (("ref1", True), ("ref2", False)):
            pred = face_manifold(p1, R1, h1, pos2, R2, s2, 0.002, a, raw, ref1)
            ok = match(cons, pred)
            st = scores.setdefault(name, [0, 0])
            st[0] += int(bool(ok))
            st[1] += 1
            if name == "ref1" and not ok and len(bad) < 12:
                bad.append((i, code, len(cons), len(pred)))
    print(f"edge-code configs: {tot}")
    for k, (hit, t) in scores.items():
        print(f"  {k}: {hit}/{t} = {hit/max(t,1):.3f}")
    print("bad ref1 cases (i, code, mj, pred):", bad)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 1)
