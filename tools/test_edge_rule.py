"""Score the edge-code manifold with the candidate rule:
  crossings (all) + quad2 corners inside quad1 (all) +
  AT MOST ONE quad1 corner: the deepest (clcorner-like), iff inside quad2.
Tie-break variants for the deepest-corner selection are scored separately.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from verify_boxbox_hypotheses import (  # noqa: E402
    mj_contacts, quat_mat, sat_axis, support_face, outside_box, match,
)


def edge_manifold(p1, R1, h1, p2, R2, h2, margin, a, code, variant):
    C1, c1p, m1, u1, v1 = support_face(p1, R1, h1, a)
    C2, c2p, m2, u2, v2 = support_face(p2, R2, h2, -a)
    seed = np.array([0, 1, 0.]) if abs(a[2]) > 0.9 else np.array([0, 0, 1.])
    u = seed - (seed @ a) * a
    u /= np.linalg.norm(u)
    w = np.cross(a, u)
    O = p1
    P = lambda x: np.array([(x - O) @ u, (x - O) @ w])
    q1 = [P(c) for c in C1]
    q2d = [P(c) for c in C2]
    am1, am2 = a @ m1, a @ m2

    def alpha(xy, cp, m, am):
        return ((cp - O) @ m - xy[0] * (u @ m) - xy[1] * (w @ m)) / am

    def depth_at(xy):
        return alpha(xy, c2p, m2, am2) - alpha(xy, c1p, m1, am1)

    def inside(q, quad):
        sgn = 0
        for k in range(4):
            aq, bq = quad[k], quad[(k + 1) % 4]
            cz = (bq[0] - aq[0]) * (q[1] - aq[1]) - (bq[1] - aq[1]) * (q[0] - aq[0])
            if abs(cz) < 1e-15:
                continue
            s = 1 if cz > 0 else -1
            if sgn == 0:
                sgn = s
            elif s != sgn:
                return False
        return True

    pts = []
    for k in range(4):
        for l in range(4):
            a1, b1 = q1[k], q1[(k + 1) % 4]
            a2, b2 = q2d[l], q2d[(l + 1) % 4]
            d1, d2 = b1 - a1, b2 - a2
            den = d1[0] * d2[1] - d1[1] * d2[0]
            if abs(den) < 1e-14:
                continue
            w0 = a2 - a1
            tt = (w0[0] * d2[1] - w0[1] * d2[0]) / den
            ss = (w0[0] * d1[1] - w0[1] * d1[0]) / den
            if 0 <= tt <= 1 and 0 <= ss <= 1:
                pts.append(a1 + tt * d1)
    for k in range(4):
        if inside(q2d[k], q1):
            pts.append(q2d[k])
    # the single clcorner of box1's support face
    i_e, j_e = divmod(code - 12, 3)
    raw = np.cross(R1[:, i_e], R2[:, j_e])
    t = p2 - p1
    loop = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    if variant.startswith("bits"):
        al = (raw @ t) < 0 if variant == "bits1" else (raw @ t) > 0
        bu = ((raw @ u1) > 0) != al
        bv = ((raw @ v1) > 0) != al
        su = -1.0 if bu else 1.0
        sv = -1.0 if bv else 1.0
        i0 = loop.index((su, sv))
    else:
        # argmax depth with low-slot (variant 'amin') or high-slot tie
        D1 = [depth_at(q) for q in q1]
        order = range(4) if variant == "amin" else range(3, -1, -1)
        i0 = min(order, key=lambda k: D1[k])
    if inside(q1[i0], q2d):
        pts.append(q1[i0])

    out = []
    for q in pts:
        d = depth_at(q)
        if d > margin:
            continue
        al1 = alpha(q, c1p, m1, am1)
        pos = O + q[0] * u + q[1] * w + (al1 + 0.5 * d) * a
        r1 = outside_box(pos, p1, R1, h1, margin)
        r2 = outside_box(pos, p2, R2, h2, margin)
        if (r1 == 1 and r2 != -1) or (r2 == 1 and r1 != -1):
            continue
        out.append((d, pos))
    ded = []
    for dth, pos in out:
        if not any(np.allclose(pos, p, atol=1e-9) for _, p in ded):
            ded.append((dth, pos))
    return ded[:8]


def main(n=2000, seed=1):
    fams = [("tilt", 800, 0), ("random", 2000, 1), ("tilt", 800, 2)]
    for fam, n, seed in fams:
        rng = np.random.RandomState(seed)
        scores = {}
        tot = 0
        bad = {}
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
                w2, x2, y2, z2 = np.array([np.cos(yaw / 2), 0, 0,
                                           np.sin(yaw / 2)])
                q2 = np.array([
                    w1 * w2 - z1 * z2, x1 * w2 + y1 * z2,
                    y1 * w2 - x1 * z2, z1 * w2 + w1 * z2,
                ])
                q2 /= np.linalg.norm(q2)
                pos2 = np.array([rng.uniform(-0.02, 0.02),
                                 rng.uniform(-0.02, 0.02),
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
            for v in ("bits1", "bits2", "amin", "amax"):
                pred = edge_manifold(p1, R1, h1, pos2, R2, s2, 0.002, a,
                                     code, v)
                ok = match(cons, pred)
                st = scores.setdefault(v, [0, 0])
                st[0] += int(bool(ok))
                st[1] += 1
                if not ok and len(bad.setdefault(v, [])) < 8:
                    bad[v].append(i)
        print(f"[{fam} seed={seed}] edge-code configs: {tot}")
        for k, (hit, t) in sorted(scores.items()):
            print(f"  {k}: {hit}/{t} = {hit/max(t,1):.3f}  bad: {bad.get(k, [])[:8]}")


if __name__ == "__main__":
    main()
