"""Lockstep getup-trajectory debugger vs real MuJoCo.

Steps the reference getup env and our engine from the same seeded fall
state with identical actions, substep by substep, and at the first
constraint-level mismatch (qacc error while states still agree) dumps the
full contact sets and EFC row data from both sides.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/debug_getup.py [aerr_thresh] [seed]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import ref_shim

ref_shim.import_reference()
import jax.numpy as jnp  # noqa: E402
import mujoco  # noqa: E402

from smplsim_tpu.models import registry  # noqa: E402
from smplsim_tpu.physics import constraints as C  # noqa: E402
from smplsim_tpu.physics import engine  # noqa: E402
from smplsim_tpu.physics.collision_pairs import MAX_SELF, self_contacts  # noqa: E402
from test_getup_parity import make_ref_getup  # noqa: E402


def decode_J(md, nv):
    J = np.zeros((md.nefc, nv))
    adr, nnz, cols = md.efc_J_rowadr, md.efc_J_rownnz, md.efc_J_colind
    for r in range(md.nefc):
        for kk in range(nnz[r]):
            J[r, cols[adr[r] + kk]] = md.efc_J[adr[r] + kk]
    return J


def main():
    thresh = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-4
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    model64 = registry.default_humanoid(dtype=jnp.float64)
    env_ref = make_ref_getup(ref_shim)
    env_ref.reset(seed=seed)
    env_ref.reset(seed=seed)
    md = env_ref.mj_data
    mm = env_ref.mj_model
    mujoco.mj_forward(mm, md)
    st = engine.PhysicsState(jnp.asarray(md.qpos.copy()), jnp.asarray(md.qvel.copy()))
    cache = engine.pd_cache(model64, st)
    rng = np.random.RandomState(11)
    step1 = jax.jit(
        lambda s, c, act: engine.control_step(
            model64, s, act, control_freq_inv=1, cache=c
        )
    )
    names = [
        mujoco.mj_id2name(mm, mujoco.mjtObj.mjOBJ_GEOM, g) or f"g{g}"
        for g in range(mm.ngeom)
    ]
    bn = model64.body_names
    for t in range(150):
        a = jnp.asarray(rng.uniform(-0.3, 0.3, 69))
        for k in range(15):
            torque = env_ref.compute_torque(np.asarray(a))
            md.ctrl[:] = torque
            mujoco.mj_step(mm, md)
            st, info, p, cache = step1(st, cache, a)
            qerr = np.abs(np.asarray(st.qpos) - md.qpos).max()
            aerr = np.abs(np.asarray(info.sol.qacc) - md.qacc).max()
            if aerr > thresh and qerr < 1e-8:
                print(f"MISMATCH t={t} sub={k}: aerr {aerr:.3e} qerr {qerr:.1e} "
                      f"nefc {md.nefc} nactive {int(info.sol.nactive)}")
                for i in range(md.ncon):
                    c = md.contact[i]
                    print(f"  mj  {names[c.geom1]:10s} {names[c.geom2]:10s} "
                          f"dist {c.dist:+.7f} pos {np.round(c.pos, 5)} "
                          f"n {np.round(c.frame[:3], 4)}")
                nlim = sum(
                    1 for i in range(md.nefc)
                    if md.efc_type[i] == mujoco.mjtConstraint.mjCNSTR_LIMIT_JOINT
                )
                efc = info.efc
                for j in range(C.MAX_CONTACTS):
                    if bool(efc.con_active[j]):
                        g = int(efc.con_geom[j])
                        print(f"  ours floor g{g} ({names[g + 1]:10s}) "
                              f"dist {float(efc.con_dist[j]):+.7f} "
                              f"pos {np.round(np.asarray(efc.con_pos[j]), 5)}")
                sc = self_contacts(model64, info.kin)
                for j in range(MAX_SELF):
                    if bool(sc.active[j]):
                        print(f"  ours self {bn[int(sc.body1[j])]:10s} "
                              f"{bn[int(sc.body2[j])]:10s} "
                              f"dist {float(sc.dist[j]):+.7f} "
                              f"pos {np.round(np.asarray(sc.pos[j]), 5)} "
                              f"n {np.round(np.asarray(sc.normal[j]), 4)}")
                print("  mj limit rows:", nlim, " ours:",
                      int(np.asarray(efc.active)[:C.MAX_LIMITS].sum()))
                ar = np.asarray(efc.aref)
                act = np.asarray(efc.active)
                ours_rows = sorted(np.round(ar[np.nonzero(act)[0]], 4).tolist())
                mj_rows = sorted(np.round(md.efc_aref[: md.nefc], 4).tolist())
                for i in range(max(len(ours_rows), len(mj_rows))):
                    o = ours_rows[i] if i < len(ours_rows) else None
                    mj = mj_rows[i] if i < len(mj_rows) else None
                    tag = "MATCH" if (o is not None and mj is not None
                                      and abs(o - mj) < 1e-2) else "DIFF"
                    print(f"    aref ours {o} mj {mj} {tag}")
                return
        err = np.abs(np.asarray(st.qpos) - md.qpos).max()
        if err > 1e-2:
            print(f"DIVERGED t={t} without a clean single-substep mismatch "
                  f"(qerr {err:.2e}) — lower the threshold")
            return
    print("150 steps without mismatch above threshold")


if __name__ == "__main__":
    main()
