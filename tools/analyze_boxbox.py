"""Classify MuJoCo box-box contacts against candidate constructions.

For each face-case sample: express everything in the reference-face 2D frame,
build candidate point sets (incident corners raw/clamped, edge-rect crossings,
rect corners), and report which construction explains each observed contact.
"""
import numpy as np
from probe_boxbox import mj_contacts, rand_quat, quat_mat


def analyze(s1, s2, pos2, q2, cons, verbose=False):
    R2 = quat_mat(q2)
    n = cons[0][2]  # shared normal, from geom1 toward geom2
    sizes = [np.asarray(s1), np.asarray(s2)]
    Rs = [np.eye(3), R2]
    ps = [np.zeros(3), np.asarray(pos2)]

    # find which box owns the reference face: axis of box k with |dot|~1
    ref = None
    for k in (0, 1):
        for ax in range(3):
            d = Rs[k][:, ax] @ n
            if abs(abs(d) - 1.0) < 1e-6:
                ref = (k, ax, np.sign(d))
    if ref is None:
        return "edge-case", None
    k, ax, sgn = ref
    other = 1 - k
    # reference face: outward normal of ref box toward the other box
    # basis: (u, v) in-plane, w = outward normal of the reference face
    w = Rs[k][:, ax] * (sgn if k == 0 else -sgn)
    # hmm: n points 1->2. If k==0 the face points toward box2: outward = n.
    # If k==1 the face points toward box1: outward = -n.
    w = n if k == 0 else -n
    u = Rs[k][:, (ax + 1) % 3]
    v = Rs[k][:, (ax + 2) % 3]
    hu, hv = sizes[k][(ax + 1) % 3], sizes[k][(ax + 2) % 3]
    face_center = ps[k] + Rs[k][:, ax] * sgn * 0 + w * sizes[k][ax]
    # NOTE: w = Rs[k][:,ax]*s where s makes it outward; face center:
    s_face = np.sign(Rs[k][:, ax] @ w)
    face_center = ps[k] + Rs[k][:, ax] * s_face * sizes[k][ax]

    # incident face of the other box: its axis most anti-parallel to w
    dots = Rs[other].T @ w
    iax = np.argmax(np.abs(dots))
    isgn = -np.sign(dots[iax])  # incident face normal ~ -w
    ic = ps[other] + Rs[other][:, iax] * isgn * sizes[other][iax]
    iu = Rs[other][:, (iax + 1) % 3]
    iv = Rs[other][:, (iax + 2) % 3]
    ihu, ihv = sizes[other][(iax + 1) % 3], sizes[other][(iax + 2) % 3]
    corners3d = [
        ic + iu * su * ihu + iv * sv * ihv
        for su in (-1, 1) for sv in (-1, 1)
    ]

    def to2d(p):
        d = p - face_center
        return np.array([d @ u, d @ v]), d @ w

    inc2d = [to2d(c) for c in corners3d]  # [(xy, depth)]
    # candidate sets
    raw = [xy for xy, _ in inc2d]
    clamp = [np.clip(xy, [-hu, -hv], [hu, hv]) for xy in raw]
    # edge crossings of incident quad (in 2d, order corners as quad loop)
    order = [0, 1, 3, 2]
    quad = [raw[i] for i in order]
    crossings = []
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        for dim, lim in ((0, hu), (1, hv)):
            for s in (-1, 1):
                denom = b[dim] - a[dim]
                if abs(denom) > 1e-12:
                    t = (s * lim - a[dim]) / denom
                    if 0 <= t <= 1:
                        p = a + t * (b - a)
                        if abs(p[1 - dim]) <= [hu, hv][1 - dim] + 1e-12:
                            crossings.append(p)
    rect_corners = [
        np.array([su * hu, sv * hv]) for su in (-1, 1) for sv in (-1, 1)
    ]

    def inside_quad(p):
        # point-in-convex-quad
        sgns = []
        for i in range(4):
            a, b = quad[i], quad[(i + 1) % 4]
            e = b - a
            sgns.append(np.sign(e[0] * (p[1] - a[1]) - e[1] * (p[0] - a[0])))
        sgns = [s for s in sgns if s != 0]
        return all(s == sgns[0] for s in sgns)

    rect_inside = [p for p in rect_corners if inside_quad(p)]

    sets = {
        "raw_corner": raw,
        "clamped_corner": clamp,
        "crossing": crossings,
        "rect_corner_inside": rect_inside,
    }
    results = []
    for dist, pos, _ in cons:
        xy, _ = to2d(pos)
        labels = []
        for name, pts in sets.items():
            for p in pts:
                if np.linalg.norm(p - xy) < 1e-6:
                    labels.append(name)
                    break
        results.append((tuple(np.round(xy, 5)), dist, labels))
    return "face", results


def main(n=300, seed=3):
    from collections import Counter
    rng = np.random.RandomState(seed)
    label_hist = Counter()
    unexplained = []
    edge_cases = 0
    face_cases = 0
    for i in range(n):
        s1 = rng.uniform(0.03, 0.09, 3)
        s2 = rng.uniform(0.03, 0.09, 3)
        q2 = rand_quat(rng)
        dirn = rng.normal(size=3)
        dirn /= np.linalg.norm(dirn)
        base = (s1 + s2).max()
        pos2 = dirn * rng.uniform(0.3, 1.0) * base
        cons = mj_contacts(pos2, q2, s1, s2)
        if not cons:
            continue
        kind, results = analyze(s1, s2, pos2, q2, cons)
        if kind == "edge-case":
            edge_cases += 1
            continue
        face_cases += 1
        for xy, dist, labels in results:
            key = "+".join(sorted(set(labels))) if labels else "UNEXPLAINED"
            label_hist[key] += 1
            if not labels:
                unexplained.append((i, xy, dist))
    print("face configs:", face_cases, "edge configs:", edge_cases)
    for k, c in label_hist.most_common():
        print(f"  {k}: {c}")
    print("unexplained samples:", unexplained[:10])


if __name__ == "__main__":
    main()
