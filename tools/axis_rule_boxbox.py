"""Derive mjc_BoxBox's separating-axis selection rule empirically.

For each random touching config, compute penetration depth along all 15
candidate axes (6 faces + 9 edge crosses) and compare with the axis MuJoCo
actually chose (the shared contact normal). Fit the face-vs-edge bias.
"""
import numpy as np
from probe_boxbox import mj_contacts, rand_quat, quat_mat


def axis_penetrations(s1, s2, pos2, R2):
    """Returns list of (axis_world, depth, kind, idx). depth>0 = overlap."""
    s1 = np.asarray(s1); s2 = np.asarray(s2); t = np.asarray(pos2)
    R1 = np.eye(3)
    out = []
    def pen(axis):
        axis = axis / np.linalg.norm(axis)
        r1 = sum(s1[i] * abs(R1[:, i] @ axis) for i in range(3))
        r2 = sum(s2[i] * abs(R2[:, i] @ axis) for i in range(3))
        return r1 + r2 - abs(t @ axis)
    for i in range(3):
        a = R1[:, i]
        out.append((a, pen(a), "face1", i))
    for i in range(3):
        a = R2[:, i]
        out.append((a, pen(a), "face2", i))
    for i in range(3):
        for j in range(3):
            c = np.cross(R1[:, i], R2[:, j])
            nc = np.linalg.norm(c)
            if nc > 1e-10:
                out.append((c / nc, pen(c), "edge", (i, j)))
    return out


def main(n=400, seed=11):
    rng = np.random.RandomState(seed)
    face_wins, edge_wins = [], []
    mismatch = 0
    total = 0
    ratios = []
    for i in range(n):
        s1 = rng.uniform(0.03, 0.09, 3)
        s2 = rng.uniform(0.03, 0.09, 3)
        q2 = rand_quat(rng)
        dirn = rng.normal(size=3); dirn /= np.linalg.norm(dirn)
        base = (s1 + s2).max()
        pos2 = dirn * rng.uniform(0.3, 1.0) * base
        cons = mj_contacts(pos2, q2, s1, s2)
        if not cons:
            continue
        total += 1
        n_obs = cons[0][2]
        R2 = quat_mat(q2)
        axes = axis_penetrations(s1, s2, pos2, R2)
        # chosen = axis matching observed normal (up to sign)
        chosen = None
        for a, d, kind, idx in axes:
            if abs(abs(a @ n_obs) - 1.0) < 1e-6:
                chosen = (a, d, kind, idx)
                break
        if chosen is None:
            mismatch += 1
            continue
        # min-penetration face axis and edge axis
        faces = [x for x in axes if x[2] in ("face1", "face2")]
        edges = [x for x in axes if x[2] == "edge"]
        best_face = min(faces, key=lambda x: x[1])
        best_edge = min(edges, key=lambda x: x[1]) if edges else None
        if chosen[2] == "edge":
            edge_wins.append((best_face[1], chosen[1]))
        else:
            # did MuJoCo pick the minimal face?
            if abs(chosen[1] - best_face[1]) > 1e-9:
                mismatch += 1
                # record which rank
            if best_edge is not None and best_edge[1] < best_face[1]:
                # face chosen although an edge axis has smaller penetration
                face_wins.append((best_face[1], best_edge[1]))
    print("total", total, "normal-not-an-axis:", mismatch)
    if face_wins:
        r = np.array([[f, e] for f, e in face_wins])
        print("face chosen despite smaller edge depth:", len(face_wins),
              " min ratio edge/face:", (r[:, 1] / r[:, 0]).min(),
              " max ratio:", (r[:, 1] / r[:, 0]).max())
    if edge_wins:
        r = np.array([[f, e] for f, e in edge_wins])
        print("edge chosen:", len(edge_wins),
              " ratios edge/face:", np.round(r[:, 1] / r[:, 0], 4)[:20])


if __name__ == "__main__":
    main()
