"""Point-set equivalence of the JAX _box_box_one (decoded mjc_BoxBox,
face + edge branches) against mujoco across config families. Batched via
vmap so the whole sweep is a handful of device calls."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from verify_boxbox_hypotheses import (  # noqa: E402
    mj_contacts, quat_mat, sat_axis, match,
)
from smplsim_tpu.physics.collision_pairs import _box_box_one  # noqa: E402


def gen(fam, n, seed):
    rng = np.random.RandomState(seed)
    cfgs = []
    for _ in range(n):
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
            w2c, x2, y2, z2 = np.array([np.cos(yaw / 2), 0, 0,
                                        np.sin(yaw / 2)])
            q2 = np.array([
                w1 * w2c - z1 * z2, x1 * w2c + y1 * z2,
                y1 * w2c - x1 * z2, z1 * w2c + w1 * z2,
            ])
            q2 /= np.linalg.norm(q2)
            pos2 = np.array([rng.uniform(-0.02, 0.02),
                             rng.uniform(-0.02, 0.02),
                             s1[2] + s2[2] * rng.uniform(0.6, 1.0)])
        cfgs.append((s1, s2, q2, pos2))
    return cfgs


def main():
    vf = jax.jit(jax.vmap(_box_box_one))
    for fam, n, seed in (("tilt", 400, 0), ("tilt", 400, 2),
                         ("random", 1500, 1), ("random", 1500, 3)):
        cfgs = gen(fam, n, seed)
        keep = []
        for (s1, s2, q2, pos2) in cfgs:
            a, pen, code = sat_axis(np.zeros(3), np.eye(3), s1, pos2,
                                    quat_mat(q2), s2)
            if pen < -0.002:
                continue
            keep.append((s1, s2, q2, pos2, code))
        B = len(keep)
        P1 = np.zeros((B, 3))
        R1 = np.tile(np.eye(3), (B, 1, 1))
        H1 = np.stack([k[0] for k in keep])
        P2 = np.stack([k[3] for k in keep])
        R2 = np.stack([quat_mat(k[2]) for k in keep])
        H2 = np.stack([k[1] for k in keep])
        M = np.full(B, 0.002)
        d, p, _, act = vf(*map(jnp.asarray, (P1, R1, H1, P2, R2, H2, M)))
        d, p, act = np.asarray(d), np.asarray(p), np.asarray(act)
        hit = tot = 0
        bad = []
        edge_tot = 0
        for bi, (s1, s2, q2, pos2, code) in enumerate(keep):
            cons = mj_contacts(pos2, q2, s1, s2)
            tot += 1
            edge_tot += int(code >= 12)
            pred = [(d[bi, k], p[bi, k]) for k in range(act.shape[1])
                    if act[bi, k]]
            ok = match(cons, pred) if cons else (len(pred) == 0)
            hit += int(bool(ok))
            if not ok and len(bad) < 10:
                bad.append((bi, code, len(cons), len(pred)))
        print(f"[{fam} seed={seed}] {hit}/{tot} = {hit/max(tot,1):.4f} "
              f"(edge-code: {edge_tot}) bad={bad}", flush=True)


if __name__ == "__main__":
    main()
