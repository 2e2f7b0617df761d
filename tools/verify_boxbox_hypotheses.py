"""Score box-box manifold construction hypotheses against MuJoCo.

Decoded facts from the mjc_BoxBox disassembly (tools/boxbox_asm_notes.md):
  * SAT preference: each later axis must beat the running best by a
    RELATIVE (1-1e-12) factor (face axes first, so ~exact ties keep faces);
  * face codes 0..11 (code/6 = reference box, code%6 = face), edge 12..20;
  * final filter: a point is dropped iff outside one margin-inflated box
    (mju_outsideBox tolerance 1.01) and not strictly inside the other;
  * exact-coordinate dedup keeps the lowest slot.

This script tests CLIP-STAGE variants against mujoco across random configs
+ tilt families, reporting per-variant match rates (point-set equality to
5e-4). Variants:
  A: both support faces projected perpendicular to the SAT axis (repo r2)
  B: reference-face-plane clip; incident corners projected along the
     REFERENCE normal; depth = incident-point plane gap
  C: like B but projected along the INCIDENT face normal
Each variant is scored with and without the outsideBox(1.01) final filter.
"""
import itertools
import os
import sys

import numpy as np
import mujoco


def mj_contacts(pos2, quat2, size1, size2, margin=0.001):
    xml = f"""
<mujoco><option><flag gravity="disable"/></option><worldbody>
<body pos="0 0 0"><geom type="box" size="{size1[0]} {size1[1]} {size1[2]}" margin="{margin}"/><freejoint/></body>
<body pos="{pos2[0]} {pos2[1]} {pos2[2]}" quat="{quat2[0]} {quat2[1]} {quat2[2]} {quat2[3]}"><geom type="box" size="{size2[0]} {size2[1]} {size2[2]}" margin="{margin}"/><freejoint/></body>
</worldbody></mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    return [(d.contact[i].dist, d.contact[i].pos.copy(),
             d.contact[i].frame[:3].copy()) for i in range(d.ncon)]


def quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def sat_axis(p1, R1, h1, p2, R2, h2):
    """MuJoCo SAT: min-penetration axis, relative (1-1e-12) preference in
    the probe order faces(1), faces(2), edges. Returns (axis, pen, code)
    with the decoded code numbering (0-5 box1 faces, 6-11 box2, 12+ edge)."""
    t = p2 - p1
    best = np.inf
    axis = None
    code = -1
    for i in range(3):
        a = R1[:, i]
        pen = h1[i] + np.abs(a @ R2) @ h2 - abs(a @ t)
        if pen < best * (1 - 1e-12):
            best, axis, code = pen, a, i
    for i in range(3):
        a = R2[:, i]
        pen = np.abs(a @ R1) @ h1 + h2[i] - abs(a @ t)
        if pen < best * (1 - 1e-12):
            best, axis, code = pen, a, 6 + i
    for i, j in itertools.product(range(3), range(3)):
        c = np.cross(R1[:, i], R2[:, j])
        n = np.linalg.norm(c)
        if n < 1e-15:
            continue
        a = c / n
        pen = np.abs(a @ R1) @ h1 + np.abs(a @ R2) @ h2 - abs(a @ t)
        if pen < best * (1 - 1e-12):
            best, axis, code = pen, a, 12 + 3 * i + j
    s = np.sign(axis @ t) or 1.0
    return axis * s, best, code


def support_face(p, R, h, toward):
    k = int(np.argmax(np.abs(R.T @ toward)))
    sk = np.sign(R[:, k] @ toward) or 1.0
    m = R[:, k] * sk
    c = p + m * h[k]
    fu = R[:, (k + 1) % 3] * h[(k + 1) % 3]
    fv = R[:, (k + 2) % 3] * h[(k + 2) % 3]
    loop = np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]], float)
    corners = c + loop[:, :1] * fu + loop[:, 1:] * fv
    return corners, c, m, fu, fv


def poly_clip(subject, rect_c, rect_u, rect_v):
    """Sutherland-Hodgman clip of 2-D polygon `subject` against the rect
    |x|<=|u|, |y|<=|v| in the (rect_u, rect_v) frame centered rect_c."""
    pts = [np.array([ (s - rect_c) @ rect_u / (rect_u @ rect_u),
                      (s - rect_c) @ rect_v / (rect_v @ rect_v)])
           for s in subject]
    for axis, sign in ((0, 1), (0, -1), (1, 1), (1, -1)):
        out = []
        n = len(pts)
        for i in range(n):
            a, b = pts[i], pts[(i + 1) % n]
            ia, ib = sign * a[axis] <= 1.0, sign * b[axis] <= 1.0
            if ia:
                out.append(a)
            if ia != ib:
                tt = (1.0 - sign * a[axis]) / (sign * (b[axis] - a[axis]))
                out.append(a + tt * (b - a))
        pts = out
        if not pts:
            break
    return pts


def outside_box(pt, p, R, h, margin, tol=1.01):
    loc = R.T @ (pt - p)
    hs = (h + margin)
    if np.all(np.abs(loc) <= hs / tol):
        return -1
    if np.any(np.abs(loc) > hs * tol):
        return 1
    return 0


def manifold_variant(variant, p1, R1, h1, p2, R2, h2, margin, final_filter):
    if variant == "M":
        return manifold_mujoco(p1, R1, h1, p2, R2, h2, margin)
    a, pen, code = sat_axis(p1, R1, h1, p2, R2, h2)
    is_edge = code >= 12
    if pen < -margin:
        return []
    if is_edge:
        return None  # edge case not scored here
    # reference box: the one whose face won. Re-derive: face of box1 or 2?
    # mimic code order: box1 faces then box2. Pick by best alignment.
    al1 = np.max(np.abs(R1.T @ a))
    al2 = np.max(np.abs(R2.T @ a))
    ref_is_1 = al1 >= al2 - 1e-12
    (rp, rR, rh), (ip_, iR, ih) = (
        ((p1, R1, h1), (p2, R2, h2)) if ref_is_1 else ((p2, R2, h2), (p1, R1, h1))
    )
    rn = a if ref_is_1 else -a  # outward reference normal
    Cr, cr, mr, ru, rv = support_face(rp, rR, rh, rn)
    Ci, ci, mi, iu, iv = support_face(ip_, iR, ih, -rn)

    if variant == "A":
        # perpendicular-to-axis frame (repo r2 construction)
        seed = np.array([0, 1, 0.]) if abs(a[2]) > 0.9 else np.array([0, 0, 1.])
        u = seed - (seed @ a) * a
        u /= np.linalg.norm(u)
        v = np.cross(a, u)
        q1 = [(c - p1) @ np.stack([u, v], 1) for c in Cr]
        q2 = [(c - p1) @ np.stack([u, v], 1) for c in Ci]
        pts2 = poly_clip([p1 + x[0] * u + x[1] * v for x in q2],
                         cr - ((cr - p1) @ a) * a, ru - (ru @ a) * a, rv - (rv @ a) * a) \
            if False else None
        # variant A scored via the repo engine instead; skip here
        return None
    proj_dir = mr if variant == "B" else (mi / (mi @ mr))
    # project incident corners ONTO the reference plane along proj_dir,
    # tracking the 3-D incident point for depth
    def to_plane(x3):
        lam = ((cr - x3) @ mr) / (proj_dir @ mr)
        return x3 + lam * proj_dir
    proj = [to_plane(c) for c in Ci]
    clipped2d = poly_clip(proj, cr, ru, rv)
    out = []
    for q in clipped2d:
        x3 = cr + q[0] * ru + q[1] * rv
        # incident-face point above x3 along proj_dir: solve on incident plane
        lam = ((ci - x3) @ mi) / (proj_dir @ mi)
        xi = x3 + lam * proj_dir
        depth = (xi - cr) @ mr  # negative when below reference plane
        if depth < margin:
            pos = x3 + 0.5 * depth * mr
            out.append((depth, pos))
    if final_filter:
        kept = []
        for depth, pos in out:
            r1 = outside_box(pos, p1, R1, h1, margin)
            r2 = outside_box(pos, p2, R2, h2, margin)
            if (r1 == 1 and r2 != -1) or (r2 == 1 and r1 != -1):
                continue
            kept.append((depth, pos))
        out = kept
    # exact dedup
    ded = []
    for dth, pos in out:
        if not any(np.allclose(pos, p, atol=1e-12) for _, p in ded):
            ded.append((dth, pos))
    return ded


def edge_contact(p1, R1, h1, p2, R2, h2, margin, code, a, pen):
    """Edge-edge branch (code >= 12): one contact at the closest-point
    midpoint of the two witness edges, dist = -penetration."""
    i, j = divmod(code - 12, 3)
    # witness edge on box k: the edge along axis i whose other two
    # coordinates are at the support corner toward +-a
    def edge(p, R, h, axis_i, toward):
        o = p.copy()
        for k in range(3):
            if k == axis_i:
                continue
            s = np.sign(R[:, k] @ toward) or 1.0
            o = o + s * R[:, k] * h[k]
        return o - R[:, axis_i] * h[axis_i], o + R[:, axis_i] * h[axis_i]
    a1, b1 = edge(p1, R1, h1, i, a)
    a2, b2 = edge(p2, R2, h2, j, -a)
    d1, d2 = b1 - a1, b2 - a2
    r = a2 - a1
    A = d1 @ d1
    B = d1 @ d2
    C = d2 @ d2
    D = d1 @ r
    E = d2 @ r
    den = A * C - B * B
    t = np.clip((D * C - B * E) / den, 0, 1) if abs(den) > 1e-15 else 0.5
    s = np.clip((B * t - E) / C, 0, 1)
    c1 = a1 + t * d1
    c2 = a2 + s * d2
    return [(-pen, 0.5 * (c1 + c2))]


# Decoded canonical corner-enumeration order per (box1 support-face axis,
# sign): the edge branch emits AT MOST ONE box1-face corner — the first
# inside-the-other-quad corner in mjc_BoxBox's rotmore enumeration. Slots
# are the support-face loop order [--, +-, ++, -+] over axes (k+1,k+2)%3.
# Fitted on (kax,sign)-grouped probe sweeps (12k random configs, zero
# intra-class contradictions); scores 100% on tilt families and 99.5% on
# fully random configs (residual: one extra deep point at >50%
# interpenetration, mechanism undecoded).
EDGE_C1_ORDER = {
    (0, 1): [3, 2, 0, 1], (0, -1): [0, 1, 3, 2],
    (1, 1): [1, 0, 2, 3], (1, -1): [0, 1, 3, 2],
    (2, 1): [0, 3, 1, 2], (2, -1): [1, 2, 0, 3],
}


def _edge_manifold(p1, R1, h1, p2, R2, h2, margin, a):
    """Decoded edge-code manifold: both support-face quads projected PERP
    to the cross axis; candidates = pairwise edge crossings + box2-face
    corners inside box1's quad + AT MOST ONE box1-face corner (first
    inside one in the canonical EDGE_C1_ORDER enumeration)."""
    C1, c1p, m1, u1, v1 = support_face(p1, R1, h1, a)
    C2, c2p, m2, u2, v2 = support_face(p2, R2, h2, -a)
    la = R1.T @ a
    kax = int(np.argmax(np.abs(la)))
    sk = 1 if la[kax] > 0 else -1
    order = EDGE_C1_ORDER[(kax, sk)]
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
            cz = ((bq[0] - aq[0]) * (q[1] - aq[1])
                  - (bq[1] - aq[1]) * (q[0] - aq[0]))
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
    for k in order:
        if inside(q1[k], q2d):
            pts.append(q1[k])
            break
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


def _edge_clip_manifold(p1, R1, h1, p2, R2, h2, margin, a):
    """Superseded polygon heuristic (kept for comparison): both quads'
    crossings + ALL inside corners of both quads."""
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
            d1 = b1 - a1
            d2 = b2 - a2
            den = d1[0] * d2[1] - d1[1] * d2[0]
            if abs(den) < 1e-14:
                continue
            w0 = a2 - a1
            tt = (w0[0] * d2[1] - w0[1] * d2[0]) / den
            ss = (w0[0] * d1[1] - w0[1] * d1[0]) / den
            if 0 <= tt <= 1 and 0 <= ss <= 1:
                pts.append(a1 + tt * d1)
    for k in range(4):
        if inside(q1[k], q2d):
            pts.append(q1[k])
        if inside(q2d[k], q1):
            pts.append(q2d[k])
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
        if not any(np.allclose(pos, p, atol=1e-12) for _, p in ded):
            ded.append((dth, pos))
    return ded[:8]


def manifold_mujoco(p1, R1, h1, p2, R2, h2, margin):
    """Decoded mjc_BoxBox face-case pipeline (tools/boxbox_asm_notes.md):
    per-line border clipping + raw deepest corner + inside-rect quad
    corners + contained rect corners, depth<=margin filter, 0.5-midpoint
    positions, outsideBox(1.01) drop, exact dedup."""
    a, pen, code = sat_axis(p1, R1, h1, p2, R2, h2)
    if pen < -margin:
        return []
    if code >= 12:
        if not os.environ.get("BB_EDGES"):
            return None
        return _edge_manifold(p1, R1, h1, p2, R2, h2, margin, a)
    ref_is_1 = code < 6
    (rp, rR, rh), (ip_, iR, ih) = (
        ((p1, R1, h1), (p2, R2, h2)) if ref_is_1 else ((p2, R2, h2), (p1, R1, h1))
    )
    rn = a if ref_is_1 else -a
    Cr, cr, mr, ru, rv = support_face(rp, rR, rh, rn)
    Ci, ci, mi, iu, iv = support_face(ip_, iR, ih, -rn)
    hu, hv = np.linalg.norm(ru), np.linalg.norm(rv)
    eu, ev = ru / hu, rv / hv

    def p2d(x3):
        lam = ((cr - x3) @ mr) / (rn @ mr)
        q = x3 + lam * rn
        return np.array([(q - cr) @ eu, (q - cr) @ ev])

    def dep(x3):
        return (x3 - cr) @ mr

    Q = [p2d(c) for c in Ci]
    D = [dep(c) for c in Ci]
    # in-plane test on the incident face's two tangent HALF-AXES (0.5 const)
    in_u = abs((iu / np.linalg.norm(iu)) @ rn) < 0.5
    in_v = abs((iv / np.linalg.norm(iv)) @ rn) < 0.5
    n_in = int(in_u) + int(in_v)
    # deepest incident corner (clcorner): decoded bit rule — with the RAW
    # (un-oriented) SAT face axis and al = (raw_axis . t < 0), the corner
    # bit for incident axis j is (raw_axis . col_j > 0) XOR al; the strict
    # ">" fixes the equal-depth ties that argmin breaks the wrong way.
    if code >= 12:
        i_e, j_e = divmod(code - 12, 3)
        raw = np.cross(R1[:, i_e], R2[:, j_e])
    else:
        raw = rR[:, code % 3]
    al = (raw @ (p2 - p1)) < 0 if ref_is_1 else (raw @ (p1 - p2)) < 0
    def bit(col):
        return ((raw @ col) > 0) != al
    su = -1.0 if bit(iu) else 1.0
    sv = -1.0 if bit(iv) else 1.0
    corner_idx = {(-1.0, -1.0): 0, (1.0, -1.0): 1, (1.0, 1.0): 2,
                  (-1.0, 1.0): 3}
    i0 = corner_idx[(su, sv)]

    pts = []  # (q2d, depth)
    # corner layout: Ci from support_face loop order [--, +-, ++, -+]
    # adjacency in u: slot^1-ish; easier: explicit adjacency by loop index
    adj_u = {0: 1, 1: 0, 2: 3, 3: 2}   # differ in u sign
    adj_v = {0: 3, 3: 0, 1: 2, 2: 1}   # differ in v sign

    if n_in >= 2:
        edges = [(k, (k + 1) % 4) for k in range(4)]
    elif n_in == 1:
        nb = adj_u[i0] if in_u else adj_v[i0]
        edges = [(i0, nb)]
    else:
        edges = []
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
    # quad corners, inside-rect gated (includes c0's slot; the raw c0 is
    # appended LAST below — candidate order matters under the 8-point cap,
    # and probed overflow cases keep corners over the raw c0)
    if n_in >= 2:
        others = list(range(4))
    elif n_in == 1:
        others = [adj_u[i0] if in_u else adj_v[i0]]
    else:
        others = []
    for k in others:
        if abs(Q[k][0]) <= hu and abs(Q[k][1]) <= hv:
            pts.append((Q[k], D[k]))
    # contained rect corners (2-in-plane regime only)
    if n_in >= 2:
        q0, qu, qv = Q[i0], Q[adj_u[i0]], Q[adj_v[i0]]
        U, V = qu - q0, qv - q0
        det = U[0] * V[1] - U[1] * V[0]
        if abs(det) > 1e-15:
            for su in (1.0, -1.0):
                for sv in (1.0, -1.0):
                    rc = np.array([su * hu, sv * hv])
                    w = rc - q0
                    aa = (w[0] * V[1] - w[1] * V[0]) / det
                    bb = (U[0] * w[1] - U[1] * w[0]) / det
                    if 0.0 <= aa <= 1.0 and 0.0 <= bb <= 1.0:
                        du = D[adj_u[i0]] - D[i0]
                        dv_ = D[adj_v[i0]] - D[i0]
                        pts.append((rc, D[i0] + aa * du + bb * dv_))
    # raw deepest corner, no inside test, LAST in slot order
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
    return ded[:8]  # decoded output cap: first 8 surviving candidates


def match(cons, pred, tol=5e-4):
    if pred is None:
        return None
    if len(cons) != len(pred):
        return False
    used = set()
    for _, cp, _ in cons:
        hit = None
        for k, (_, pp) in enumerate(pred):
            if k not in used and np.linalg.norm(cp - pp) < tol:
                hit = k
                break
        if hit is None:
            return False
        used.add(hit)
    return True


def main(n=300, seed=0):
    rng = np.random.RandomState(seed)
    family = os.environ.get("BB_FAMILY", "tilt")
    scores = {}
    mism = {}
    total = 0
    for i in range(n):
        s1 = rng.uniform(0.03, 0.09, 3)
        s2 = rng.uniform(0.03, 0.09, 3)
        if family == "random":
            q2 = rng.normal(size=4)
            q2 /= np.linalg.norm(q2)
            dirn = rng.normal(size=3)
            dirn /= np.linalg.norm(dirn)
            pos2 = dirn * rng.uniform(0.3, 1.0) * (s1 + s2).max()
            th = 0.0
        else:
            # tilt family: rotate about x by theta in [0, 60deg], small yaw
            th = rng.uniform(0, np.pi / 3)
            yaw = rng.uniform(-0.3, 0.3)
            qx = np.array([np.cos(th / 2), np.sin(th / 2), 0, 0])
            qz = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
            w1, x1, y1, z1 = qx
            w2, x2, y2, z2 = qz
            q2 = np.array([
                w1 * w2 - z1 * z2, x1 * w2 + y1 * z2,
                y1 * w2 - x1 * z2, z1 * w2 + w1 * z2,
            ])
            q2 /= np.linalg.norm(q2)
            pos2 = np.array([rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02),
                             s1[2] + s2[2] * rng.uniform(0.6, 1.0)])
        cons = mj_contacts(pos2, q2, s1, s2)
        if not cons:
            continue
        R2 = quat_mat(q2)
        total += 1
        for variant in ("M", "B"):
            for ff in (True,):
                pred = manifold_variant(
                    variant, np.zeros(3), np.eye(3), s1, pos2, R2, s2,
                    0.002, ff)
                key = f"{variant}{'+filter' if ff else ''}"
                ok = match(cons, pred)
                if ok is None:
                    scores.setdefault(key, [0, 0])[1] += 0  # edge case skip
                else:
                    st = scores.setdefault(key, [0, 0])
                    st[0] += int(ok)
                    st[1] += 1
                    if not ok and variant == "M":
                        kind = ("extra" if len(pred) > len(cons) else
                                "missing" if len(pred) < len(cons) else "pos")
                        deg = np.degrees(th)
                        mism.setdefault(kind, []).append(
                            (deg, len(cons), len(pred), i))
    print(f"configs touching: {total}")
    for k, (hit, tot) in sorted(scores.items()):
        print(f"  {k}: {hit}/{tot} = {hit/max(tot,1):.3f}")
    for kind, lst in mism.items():
        degs = np.array([x[0] for x in lst])
        print(f"  mism {kind}: n={len(lst)} tilt deg p10/50/90 = "
              f"{np.percentile(degs, [10, 50, 90]).round(1)} "
              f"(mj,pred) counts: {[(c, p) for _, c, p, _ in lst[:8]]} "
              f"cases: {[x[3] for x in lst[:10]]}")


def debug_case(case_i, n=300, seed=0):
    rng = np.random.RandomState(seed)
    for i in range(n):
        s1 = rng.uniform(0.03, 0.09, 3)
        s2 = rng.uniform(0.03, 0.09, 3)
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
        if i != case_i:
            continue
        cons = mj_contacts(pos2, q2, s1, s2)
        R2 = quat_mat(q2)
        pred = manifold_mujoco(np.zeros(3), np.eye(3), s1, pos2, R2, s2, 0.002)
        print(f"case {i}: tilt={np.degrees(th):.1f} deg  s1={s1.round(3)} s2={s2.round(3)}")
        for dist, pos, fr in cons:
            print(f"  mj  d={dist:+.5f} pos={pos.round(5)}")
        for d, pos in pred:
            near = min(np.linalg.norm(pos - c[1]) for c in cons) if cons else 9
            print(f"  our d={d:+.5f} pos={pos.round(5)}  nearest={near:.5f}")
        return


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "debug":
        debug_case(int(sys.argv[2]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
