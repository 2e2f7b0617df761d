"""Decode mjc_BoxBox's EDGE-code (code>=12) selection rule empirically.

For configs whose SAT winner is an edge-cross axis, enumerate the full
candidate dictionary in the perpendicular-projection frame (16 quad-quad
edge crossings with (k,l) identity + 8 quad corners), apply only the
shared filters (depth<=margin, outsideBox(1.01), dedup), and report which
candidates MuJoCo emits vs drops together with structural features:
  * which quad edges produced the crossing, and whether each is the
    box's WITNESS edge (the edge realizing the SAT axis, i.e. the support
    edge along the crossed axis),
  * depth rank, containment, distance to the witness-edge closest points.
The goal is the analogue of the face-case in-plane regime rule.
"""
import itertools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from verify_boxbox_hypotheses import (  # noqa: E402
    mj_contacts, quat_mat, sat_axis, support_face, outside_box,
)


def witness_edge(p, R, h, axis_i, toward):
    """Support edge of the box along local axis axis_i toward `toward`:
    (endpoint a, endpoint b)."""
    o = p.copy()
    for k in range(3):
        if k == axis_i:
            continue
        s = np.sign(R[:, k] @ toward) or 1.0
        o = o + s * R[:, k] * h[k]
    return o - R[:, axis_i] * h[axis_i], o + R[:, axis_i] * h[axis_i]


def candidates(p1, R1, h1, p2, R2, h2, margin, a, code):
    """Full edge-code candidate dictionary with identities."""
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

    def to3d(xy):
        al1 = alpha(xy, c1p, m1, am1)
        d = depth_at(xy)
        return O + xy[0] * u + xy[1] * w + (al1 + 0.5 * d) * a, d

    # which support-face edge index is the witness edge of each box?
    i_e, j_e = divmod(code - 12, 3)
    wa1, wb1 = witness_edge(p1, R1, h1, i_e, a)
    wa2, wb2 = witness_edge(p2, R2, h2, j_e, -a)

    def edge_id(corners, wa, wb):
        """Index k s.t. quad edge (k,k+1) == the witness edge (either
        direction), else -1."""
        for k in range(4):
            aq, bq = corners[k], corners[(k + 1) % 4]
            if (np.allclose(aq, wa, atol=1e-9) and np.allclose(bq, wb, atol=1e-9)) or \
               (np.allclose(aq, wb, atol=1e-9) and np.allclose(bq, wa, atol=1e-9)):
                return k
        return -1

    we1 = edge_id(C1, wa1, wb1)
    we2 = edge_id(C2, wa2, wb2)

    out = []  # (tag, xy, d, pos3)
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
            if not (0 <= tt <= 1 and 0 <= ss <= 1):
                continue
            xy = a1 + tt * d1
            pos, d = to3d(xy)
            out.append((f"x{k}{l}" + ("W" if k == we1 else "")
                        + ("V" if l == we2 else ""), xy, d, pos))

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

    for k in range(4):
        if inside(q1[k], q2d):
            pos, d = to3d(q1[k])
            onw = k == we1 or (k - 1) % 4 == we1
            out.append((f"c1_{k}" + ("W" if onw else ""), q1[k], d, pos))
        if inside(q2d[k], q1):
            pos, d = to3d(q2d[k])
            onw = k == we2 or (k - 1) % 4 == we2
            out.append((f"c2_{k}" + ("V" if onw else ""), q2d[k], d, pos))
    return out, (we1, we2)


def main(n=500, seed=0):
    rng = np.random.RandomState(seed)
    fam = os.environ.get("BB_FAMILY", "tilt")
    n_edge = 0
    stats = {"emitted": {}, "dropped": {}}
    unexplained = 0
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
        n_edge += 1
        margin = 0.002
        cands, (we1, we2) = candidates(p1, R1, h1, pos2, R2, s2, margin, a, code)
        # shared filters
        surv = []
        for tag, xy, d, pos in cands:
            if d > margin:
                continue
            r1 = outside_box(pos, p1, R1, h1, margin)
            r2 = outside_box(pos, pos2, R2, s2, margin)
            if (r1 == 1 and r2 != -1) or (r2 == 1 and r1 != -1):
                continue
            if any(np.allclose(pos, p, atol=1e-9) for _, _, _, p in surv):
                continue
            surv.append((tag, xy, d, pos))
        mj_pts = [c[1] for c in cons]
        matched_mj = set()
        for tag, xy, d, pos in surv:
            hit = None
            for mi, mp in enumerate(mj_pts):
                if mi not in matched_mj and np.linalg.norm(pos - mp) < 5e-4:
                    hit = mi
                    break
            key = tag[0] if tag[0] != "x" else ("x" + tag[3:] if len(tag) > 3 else "x")
            key = tag  # full tag
            # normalize: crossing tag -> which witness flags
            if tag.startswith("x"):
                key = "x_" + ("W" if "W" in tag else "-") + ("V" if "V" in tag else "-")
            else:
                key = tag[:2] + ("_w" if ("W" in tag or "V" in tag) else "_-")
            if hit is not None:
                matched_mj.add(hit)
                stats["emitted"][key] = stats["emitted"].get(key, 0) + 1
            else:
                stats["dropped"][key] = stats["dropped"].get(key, 0) + 1
        unexplained += len(mj_pts) - len(matched_mj)
        if len(mj_pts) - len(matched_mj) and n_edge < 400:
            print(f"case {i}: {len(mj_pts)-len(matched_mj)} mj points unexplained "
                  f"(code={code}, we=({we1},{we2}))")
    print(f"edge-code configs: {n_edge}, unexplained mj points: {unexplained}")
    for kind in ("emitted", "dropped"):
        print(kind, dict(sorted(stats[kind].items())))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500,
         int(sys.argv[2]) if len(sys.argv) > 2 else 0)
