"""Per-candidate-type analysis of MuJoCo's box-box manifold.

Enumerates the reference-plane clip candidates WITH provenance tags:
  corner      incident-face corner whose rect-projection is inside the rect
  rawcorner   incident-face corner OUTSIDE the rect (raw, unclipped)
  cross       incident edge x rect border single-crossing
  rectcorner  rect corner contained in the projected incident quad
and reports, over mismatching configs, which types MuJoCo actually emits —
to pin the vertex add/drop rules of the moderate-tilt and near-parallel
regimes (tools/boxbox_asm_notes.md TODO).
"""
import sys

import numpy as np

from verify_boxbox_hypotheses import (
    mj_contacts, quat_mat, sat_axis, support_face, outside_box,
)


def candidates(p1, R1, h1, p2, R2, h2, margin):
    a, pen, code = sat_axis(p1, R1, h1, p2, R2, h2)
    if code >= 12:
        return None, None
    al1 = np.max(np.abs(R1.T @ a))
    al2 = np.max(np.abs(R2.T @ a))
    ref_is_1 = al1 >= al2 - 1e-12
    (rp, rR, rh), (ip_, iR, ih) = (
        ((p1, R1, h1), (p2, R2, h2)) if ref_is_1 else ((p2, R2, h2), (p1, R1, h1))
    )
    rn = a if ref_is_1 else -a
    Cr, cr, mr, ru, rv = support_face(rp, rR, rh, rn)
    Ci, ci, mi, iu, iv = support_face(ip_, iR, ih, -rn)

    hu, hv = np.linalg.norm(ru), np.linalg.norm(rv)
    eu, ev = ru / hu, rv / hv

    def plane2d(x3):
        """project along rn onto the reference plane, return 2-D coords."""
        lam = ((cr - x3) @ mr) / (rn @ mr)
        q = x3 + lam * rn
        return np.array([(q - cr) @ eu, (q - cr) @ ev])

    def depth_of(xi):
        return (xi - cr) @ mr

    out = []
    P2 = [plane2d(c) for c in Ci]
    for k, c in enumerate(Ci):
        q = P2[k]
        inside = abs(q[0]) <= hu and abs(q[1]) <= hv
        out.append((("corner" if inside else "rawcorner"), depth_of(c),
                    q, c))
    # edge-border crossings (tag carries incident-edge id + endpoint-inside)
    ins = [abs(P2[k][0]) <= hu and abs(P2[k][1]) <= hv for k in range(4)]
    for k in range(4):
        aq, bq = P2[k], P2[(k + 1) % 4]
        a3, b3 = Ci[k], Ci[(k + 1) % 4]
        for axis, lim in ((0, hu), (1, hv)):
            for sgn in (1, -1):
                da = sgn * aq[axis] - lim
                db = sgn * bq[axis] - lim
                if (da > 0) == (db > 0) or abs(da - db) < 1e-15:
                    continue
                tt = da / (da - db)
                q = aq + tt * (bq - aq)
                other = 1 - axis
                olim = hv if axis == 0 else hu
                if abs(q[other]) > olim + 1e-12:
                    continue
                xi = a3 + tt * (b3 - a3)
                out.append((f"cross:e{k}:in{int(ins[k])}{int(ins[(k+1)%4])}",
                            depth_of(xi), q, xi))
    # contained rect corners
    for su in (1, -1):
        for sv in (1, -1):
            q = np.array([su * hu, sv * hv])
            # inside projected incident quad?
            def inside_quad(q):
                sgn = 0
                for k in range(4):
                    aq, bq = P2[k], P2[(k + 1) % 4]
                    cz = (bq[0] - aq[0]) * (q[1] - aq[1]) - (bq[1] - aq[1]) * (q[0] - aq[0])
                    if abs(cz) < 1e-15:
                        continue
                    s = 1 if cz > 0 else -1
                    if sgn == 0:
                        sgn = s
                    elif s != sgn:
                        return False
                return True
            if inside_quad(q):
                # incident-plane point above the rect corner along rn
                x3 = cr + q[0] * eu + q[1] * ev
                lam = ((ci - x3) @ mi) / (rn @ mi)
                xi = x3 + lam * rn
                out.append(("rectcorner", depth_of(xi), q, xi))
    meta = dict(cr=cr, mr=mr, rn=rn, eu=eu, ev=ev, hu=hu, hv=hv)
    return out, meta


def main(n=300, seed=0):
    rng = np.random.RandomState(seed)
    emit_by_type = {}
    drop_by_type = {}
    near_miss = {}
    count_stats = []
    raw_feat = {"emit": [], "drop": []}
    raw_rule = {"emitted_gap": [], "dropped_gap": []}
    rect_rule = {"emitted": 0, "dropped": 0}
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
        cons = mj_contacts(pos2, q2, s1, s2)
        if not cons:
            continue
        R2 = quat_mat(q2)
        cand, meta = candidates(np.zeros(3), np.eye(3), s1, pos2, R2, s2, 0.002)
        if cand is None:
            continue
        mjpts = [c[1] for c in cons]
        # precondition: depth under the pair margin; dedup by position
        # (prefer non-rawcorner tags); apply the decoded outsideBox filter
        seen = []
        flt = []
        for typ, depth, q2d, xi in sorted(
            cand, key=lambda c: c[0] == "rawcorner"
        ):
            if depth >= 0.002:
                continue
            pos = xi - 0.5 * depth * meta["mr"]
            r1 = outside_box(pos, np.zeros(3), np.eye(3), s1, 0.002)
            r2o = outside_box(pos, pos2, R2, s2, 0.002)
            if (r1 == 1 and r2o != -1) or (r2o == 1 and r1 != -1):
                continue
            if any(np.linalg.norm(pos - p) < 1e-9 for _, _, p in seen):
                continue
            seen.append((typ, depth, pos))
            flt.append((typ, depth, pos))
        ncross_by_edge = {}
        for typ, depth, pos in flt:
            if typ.startswith("cross"):
                e = typ.split(":")[1]
                ncross_by_edge[e] = ncross_by_edge.get(e, 0) + 1
        for typ, depth, pos in flt:
            dmin = min(np.linalg.norm(pos - mp) for mp in mjpts)
            hit = dmin < 5e-4
            key = typ
            if typ.startswith("cross"):
                e = typ.split(":")[1]
                key = f"cross:in{typ.split(':in')[1]}:n{ncross_by_edge[e]}"
            if not hit:
                near_miss.setdefault(key, []).append(dmin)
            d = emit_by_type if hit else drop_by_type
            d[key] = d.get(key, 0) + 1
            if typ == "rawcorner":
                raw_rule["emitted_gap" if hit else "dropped_gap"].append(depth)
                # overhang feature: 2-D border excess of this corner
                q = next(qq for tt, dd, qq, xx in cand
                         if tt == "rawcorner" and abs(dd - depth) < 1e-15)
                exc = max(abs(q[0]) - meta["hu"], abs(q[1]) - meta["hv"])
                raw_feat["emit" if hit else "drop"].append(
                    (exc, -depth, exc / max(-depth, 1e-12)))
            if typ == "rectcorner":
                rect_rule["emitted" if hit else "dropped"] += 1
        hits = [min(np.linalg.norm(pos - mp) for mp in mjpts) < 5e-4
                for _, _, pos in flt]
        depths = np.array([d for _, d, _ in flt])
        if any(hits) and not all(hits):
            worst_kept = max(depths[np.array(hits)])
            best_drop = min(depths[~np.array(hits)])
            dfo = bool(best_drop >= worst_kept - 1e-12)
        else:
            dfo = True
        count_stats.append((len(flt), len(mjpts), dfo))
        # any mujoco point not matched by any candidate?
        for mp in mjpts:
            matched = any(
                np.linalg.norm(pos - mp) < 5e-4 for _, _, pos in flt
            )
            if not matched:
                emit_by_type["UNEXPLAINED"] = emit_by_type.get("UNEXPLAINED", 0) + 1
    print("emitted by type:", emit_by_type)
    print("dropped by type:", drop_by_type)
    eg = np.array(raw_rule["emitted_gap"]); dg = np.array(raw_rule["dropped_gap"])
    if len(eg):
        print(f"rawcorner emitted: n={len(eg)} depth range [{eg.min():.5f}, {eg.max():.5f}]")
    if len(dg):
        print(f"rawcorner dropped: n={len(dg)} depth range [{dg.min():.5f}, {dg.max():.5f}]")
    print("rectcorner:", rect_rule)
    for k, lst in sorted(near_miss.items()):
        arr = np.array(lst)
        print(f"  nearmiss {k}: n={len(arr)} dist to nearest mj pt "
              f"p10/50/90 = {np.percentile(arr, [10, 50, 90]).round(5)}")
    print("count stats (ncand_after_filters, n_mj, deepest_first_ok):")
    from collections import Counter
    print("  ", Counter(count_stats).most_common(12))
    for k, lst in raw_feat.items():
        if not lst:
            continue
        r = np.array([x[2] for x in lst])
        print(f"  rawcorner {k}: n={len(r)} excess/pen ratio "
              f"p5/25/50/75/95 = {np.percentile(r, [5, 25, 50, 75, 95]).round(3)}")


if __name__ == "__main__":
    sys.path.insert(0, "tools")
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
