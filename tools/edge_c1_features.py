"""Feature table for box1-support-face-corner candidates (the only type
MuJoCo's edge branch sometimes drops): emitted vs dropped."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from analyze_boxbox_edges import candidates  # noqa: E402
from verify_boxbox_hypotheses import (  # noqa: E402
    mj_contacts, quat_mat, sat_axis, outside_box, support_face,
)


def main(n=800, seed=0):
    rng = np.random.RandomState(seed)
    fam = os.environ.get("BB_FAMILY", "tilt")
    rows = []
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
        margin = 0.002
        cands, (we1, we2) = candidates(p1, R1, h1, pos2, R2, s2, margin, a, code)
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
        depths = sorted(d for _, _, d, _ in surv)
        for tag, xy, d, pos in surv:
            if not tag.startswith("c1"):
                continue
            matched = any(np.linalg.norm(pos - mp) < 5e-4 for mp in mj_pts)
            k = int(tag[3])
            # features
            drank = depths.index(d)
            # distance from corner to the witness edge of box1 (in slots)
            on_we = "W" in tag
            # corner shared with witness edge endpoints?
            nmj = len(mj_pts)
            nsurv = len(surv)
            rows.append((matched, i, code, k, we1, on_we, round(d, 5),
                         drank, nsurv, nmj))
    import collections
    em = [r for r in rows if r[0]]
    dr = [r for r in rows if not r[0]]
    print(f"c1 emitted: {len(em)}, dropped: {len(dr)}")
    print("fmt: (matched, case, code, corner_k, we1, on_we, depth, drank, nsurv, nmj)")
    print("--- dropped:")
    for r in dr[:25]:
        print("  ", r)
    print("--- emitted:")
    for r in em[:25]:
        print("  ", r)
    # quick separability stats
    for name, idx in (("on_we", 5), ("drank", 7)):
        print(name, "dropped:", collections.Counter(r[idx] for r in dr),
              "emitted:", collections.Counter(r[idx] for r in em))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 800,
         int(sys.argv[2]) if len(sys.argv) > 2 else 0)
