"""Empirical study of MuJoCo's box-box manifold (mjc_BoxBox).

For random two-box configurations, records MuJoCo's emitted contacts and
compares them against geometric candidate constructions (face corners,
edge-rectangle crossings, contained corners) to identify the generation rule.
"""
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
    out = []
    for i in range(d.ncon):
        c = d.contact[i]
        out.append((c.dist, c.pos.copy(), c.frame[:3].copy()))
    return out


def rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
        [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
        [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)],
    ])


def main(n=200, seed=0):
    rng = np.random.RandomState(seed)
    stats = {"ncon": {}, "shallow": 0, "total_touch": 0}
    samples = []
    for i in range(n):
        s1 = rng.uniform(0.03, 0.09, 3)
        s2 = rng.uniform(0.03, 0.09, 3)
        q2 = rand_quat(rng)
        # place box2 near touching: random direction, distance near sum of extents
        dirn = rng.normal(size=3); dirn /= np.linalg.norm(dirn)
        base = (s1 + s2).max()
        pos2 = dirn * rng.uniform(0.3, 1.0) * base
        cons = mj_contacts(pos2, q2, s1, s2)
        k = len(cons)
        stats["ncon"][k] = stats["ncon"].get(k, 0) + 1
        if k:
            stats["total_touch"] += 1
            samples.append((s1, s2, pos2, q2, cons))
    print("ncon histogram:", dict(sorted(stats["ncon"].items())))
    print("touching:", stats["total_touch"], "/", n)
    # normals per contact group: same for all contacts in a config?
    same_n = 0
    for s1, s2, pos2, q2, cons in samples:
        ns = np.array([c[2] for c in cons])
        if np.allclose(ns, ns[0], atol=1e-9):
            same_n += 1
    print("configs where all contacts share one normal:", same_n, "/", len(samples))
    return samples


if __name__ == "__main__":
    main()
