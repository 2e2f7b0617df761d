"""Full candidate dumps for edge-code cases where the polygon manifold
over-emits: every candidate with tag/depth/emitted + regime features."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from analyze_boxbox_edges import candidates, witness_edge  # noqa: E402
from verify_boxbox_hypotheses import (  # noqa: E402
    mj_contacts, quat_mat, sat_axis, outside_box, support_face,
)


def gen(i_target, seed=0, fam="tilt"):
    rng = np.random.RandomState(seed)
    for i in range(i_target + 1):
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


def dump(case_i, seed=0, fam="tilt"):
    s1, s2, q2, pos2 = gen(case_i, seed, fam)
    p1, R1, h1 = np.zeros(3), np.eye(3), s1
    R2 = quat_mat(q2)
    a, pen, code = sat_axis(p1, R1, h1, pos2, R2, s2)
    cons = mj_contacts(pos2, q2, s1, s2)
    margin = 0.002
    cands, (we1, we2) = candidates(p1, R1, h1, pos2, R2, s2, margin, a, code)
    i_e, j_e = divmod(code - 12, 3)
    # perpendicular-frame regime features
    C1, c1p, m1, u1f, v1f = support_face(p1, R1, h1, a)
    C2, c2p, m2, u2f, v2f = support_face(pos2, R2, s2, -a)
    nu1 = abs((u1f / np.linalg.norm(u1f)) @ a)
    nv1 = abs((v1f / np.linalg.norm(v1f)) @ a)
    nu2 = abs((u2f / np.linalg.norm(u2f)) @ a)
    nv2 = abs((v2f / np.linalg.norm(v2f)) @ a)
    print(f"case {case_i}: code={code} (i,j)=({i_e},{j_e}) we=({we1},{we2}) "
          f"pen={pen:.5f}")
    print(f"  |u1.a|={nu1:.3f} |v1.a|={nv1:.3f} |u2.a|={nu2:.3f} |v2.a|={nv2:.3f}"
          f"  (0.5 regime threshold)")
    mj_pts = [c[1] for c in cons]
    print(f"  mj ({len(mj_pts)}):")
    for d, p, fr in cons:
        print(f"    d={d:+.5f} pos={p.round(5)}")
    surv = []
    for tag, xy, d, pos in cands:
        stat = []
        if d > margin:
            stat.append("depth>margin")
        r1 = outside_box(pos, p1, R1, h1, margin)
        r2 = outside_box(pos, pos2, R2, s2, margin)
        if (r1 == 1 and r2 != -1) or (r2 == 1 and r1 != -1):
            stat.append("outside")
        dup = any(np.allclose(pos, p, atol=1e-9) for _, _, _, p in surv)
        if dup:
            stat.append("dup")
        if not stat:
            surv.append((tag, xy, d, pos))
        near = min((np.linalg.norm(pos - mp) for mp in mj_pts), default=9)
        hit = "MJ " if near < 5e-4 else "-- "
        print(f"  {hit}{tag:7s} d={d:+.5f} xy=({xy[0]:+.4f},{xy[1]:+.4f}) "
              f"pos={pos.round(5)} {' '.join(stat)}")


if __name__ == "__main__":
    for c in [int(x) for x in sys.argv[1:]] or [320, 364, 382, 346]:
        dump(c)
        print()
