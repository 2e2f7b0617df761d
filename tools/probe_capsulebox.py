"""Probe MuJoCo 3.x capsule-box narrowphase behavior empirically.

Builds two-free-body scenes (one capsule, one box), sweeps relative poses,
and dumps contact count/dist/pos/normal — the ground truth for implementing
an exact TPU-native capsule-box routine (same method used for box-box in r1,
tools/probe_boxbox.py).

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/probe_capsulebox.py [mode]
"""
import sys

import mujoco
import numpy as np


def make_model(cap_size, box_size, margin=0.0):
    r, hl = cap_size
    bx, by, bz = box_size
    xml = f"""
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="cap" pos="0 0 0">
      <freejoint/>
      <geom name="cap" type="capsule" size="{r} {hl}" margin="{margin}"/>
    </body>
    <body name="box" pos="0 0 0">
      <freejoint/>
      <geom name="box" type="box" size="{bx} {by} {bz}" margin="{margin}"/>
    </body>
  </worldbody>
</mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    return m, d


def probe(m, d, cap_pos, cap_quat, box_pos, box_quat):
    d.qpos[:3] = cap_pos
    d.qpos[3:7] = cap_quat
    d.qpos[7:10] = box_pos
    d.qpos[10:14] = box_quat
    mujoco.mj_forward(m, d)
    out = []
    for i in range(d.ncon):
        c = d.contact[i]
        out.append((float(c.dist), c.pos.copy(), c.frame[:3].copy()))
    return out


def rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "random"
    rng = np.random.default_rng(0)

    if mode == "random":
        m, d = make_model((0.05, 0.15), (0.1, 0.08, 0.06))
        counts = {}
        for i in range(200):
            cp = rng.uniform(-0.25, 0.25, 3)
            cons = probe(m, d, cp, rand_quat(rng), np.zeros(3), rand_quat(rng))
            counts[len(cons)] = counts.get(len(cons), 0) + 1
            if cons and i < 40:
                print(f"#{i} ncon={len(cons)}")
                for dist, pos, n in cons:
                    print(f"   dist {dist:+.6f} pos {np.round(pos,4)} n {np.round(n,4)}")
        print("count histogram:", counts)

    elif mode == "parallel":
        # capsule parallel to the box top face, various overlaps
        m, d = make_model((0.05, 0.15), (0.1, 0.08, 0.06))
        for dz in (0.115, 0.109, 0.10, 0.08):
            for dx in (0.0, 0.05, 0.12, 0.2):
                # capsule axis along x (quat rotating z->x)
                q = np.array([np.cos(np.pi/4), 0, np.sin(np.pi/4), 0])
                cons = probe(m, d, [dx, 0, dz], q, np.zeros(3), [1, 0, 0, 0])
                print(f"dz={dz} dx={dx}: ncon={len(cons)}")
                for dist, pos, n in cons:
                    print(f"   dist {dist:+.6f} pos {np.round(pos,4)} n {np.round(n,4)}")

    elif mode == "endon":
        # capsule axis perpendicular to the top face (end-on)
        m, d = make_model((0.05, 0.15), (0.1, 0.08, 0.06))
        for dz in (0.26, 0.25, 0.23, 0.2):
            for dx in (0.0, 0.08, 0.12):
                cons = probe(m, d, [dx, 0, dz], [1, 0, 0, 0], np.zeros(3), [1, 0, 0, 0])
                print(f"dz={dz} dx={dx}: ncon={len(cons)}")
                for dist, pos, n in cons:
                    print(f"   dist {dist:+.6f} pos {np.round(pos,4)} n {np.round(n,4)}")

    elif mode == "edge":
        # capsule crossing a box edge at various angles
        m, d = make_model((0.04, 0.12), (0.1, 0.08, 0.06))
        for ang in (0.0, 0.2, 0.5, 1.0, 1.5):
            q = np.array([np.cos(ang/2), 0, 0, np.sin(ang/2)])  # rotate about z
            qx = np.array([np.cos(np.pi/4), 0, np.sin(np.pi/4), 0])  # z->x
            # compose: first align axis to x, then rotate about z
            w1, x1, y1, z1 = q
            w2, x2, y2, z2 = qx
            qc = np.array([
                w1*w2 - x1*x2 - y1*y2 - z1*z2,
                w1*x2 + x1*w2 + y1*z2 - z1*y2,
                w1*y2 - x1*z2 + y1*w2 + z1*x2,
                w1*z2 + x1*y2 - y1*x2 + z1*w2,
            ])
            cons = probe(m, d, [0.1, 0.08, 0.095], qc, np.zeros(3), [1, 0, 0, 0])
            print(f"ang={ang}: ncon={len(cons)}")
            for dist, pos, n in cons:
                print(f"   dist {dist:+.6f} pos {np.round(pos,4)} n {np.round(n,4)}")


if __name__ == "__main__":
    main()
