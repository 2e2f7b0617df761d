"""Drill into one diverging control step: per-substep comparison vs MuJoCo.

Replays the resync experiment until the first 1-step blowup, then re-runs
that control step substep by substep, resyncing OUR state to MuJoCo before
each substep and comparing post-substep (qpos, qvel) and the constraint
impulse decomposition.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp
import mujoco

import ref_shim

ref_shim.import_reference()
from smpl_sim.envs.tasks.humanoid_speed import HumanoidSpeed as RefSpeed  # noqa: E402

from smplsim_tpu.envs import HumanoidSpeed  # noqa: E402
from smplsim_tpu.models import registry  # noqa: E402
from smplsim_tpu.physics import constraints, engine, kinematics, dynamics, solver  # noqa: E402
from smplsim_tpu.physics.engine import PhysicsState  # noqa: E402

cfg = ref_shim.default_cfg(task="HumanoidSpeed")
env_ref = RefSpeed(cfg)
ref_shim.CURRENT_DATA[0] = env_ref.mj_data
env_ref.reset(seed=0)
env_ref._tar_speed = 2.0
env_ref._speed_change_steps = 10**9

model64 = registry.default_humanoid(dtype=jnp.float64)
ours = HumanoidSpeed(model64)
st0 = ours.reset(jax.random.PRNGKey(0))
step = jax.jit(ours.step)

rng = np.random.RandomState(7)
target_step = int(sys.argv[1]) if len(sys.argv) > 1 else 6
for t in range(target_step):
    a = rng.uniform(-0.3, 0.3, ours.action_size)
    env_ref.step(a)

qpos0 = env_ref.mj_data.qpos.copy()
qvel0 = env_ref.mj_data.qvel.copy()
a = rng.uniform(-0.3, 0.3, ours.action_size)
target = a * np.asarray(model64.pd_action_scale) + np.asarray(model64.pd_action_offset)

# per-substep: advance MuJoCo one substep at a time with the env's controller;
# before each substep resync ours and compare the result
mujoco.mj_forward(env_ref.mj_model, env_ref.mj_data)  # fresh prime, both sides
for k in range(15):
    qp = env_ref.mj_data.qpos.copy()
    qv = env_ref.mj_data.qvel.copy()
    phys = PhysicsState(qpos=jnp.asarray(qp), qvel=jnp.asarray(qv))
    # stale cache: MuJoCo's current qM/qfrc_bias (approximate by fresh forward
    # at the same state MuJoCo last ran forward on). To be exact, grab them:
    nv = env_ref.mj_model.nv
    M_mj = np.zeros((nv, nv))
    mujoco.mj_fullM(env_ref.mj_model, env_ref.mj_data, M_mj)
    C_mj = env_ref.mj_data.qfrc_bias.copy()
    cache = (jnp.asarray(M_mj), jnp.asarray(C_mj))

    tau_ref = env_ref.ctrler.control(a, env_ref.mj_model, env_ref.mj_data)
    env_ref.mj_data.ctrl[:] = tau_ref
    mujoco.mj_step(env_ref.mj_model, env_ref.mj_data)

    st, _, _, _ = engine.control_step(model64, phys, jnp.asarray(a), control_freq_inv=1, cache=cache)
    dq = np.abs(np.asarray(st.qpos) - env_ref.mj_data.qpos)
    dv = np.abs(np.asarray(st.qvel) - env_ref.mj_data.qvel)
    ncon = env_ref.mj_data.ncon
    nefc = env_ref.mj_data.nefc
    print(f"k={k:2d} dq={dq.max():.3e}@{dq.argmax():3d} dv={dv.max():.3e}@{dv.argmax():3d} "
          f"ncon={ncon} nefc={nefc}", flush=True)
    if dv.max() > 1e-6:
        # dump contact comparison
        print("  MuJoCo contacts:")
        for i in range(ncon):
            c = env_ref.mj_data.contact[i]
            print(f"   g1={c.geom1} g2={c.geom2} dist={c.dist:.5f} pos={np.round(c.pos,4)} dim={c.dim}")
        kin = kinematics.fk(model64, phys.qpos)
        efc = constraints.make_efc(model64, kin, phys.qpos, phys.qvel)
        act = np.asarray(efc.con_active)
        print("  ours floor contacts:")
        for i in np.where(act)[0]:
            print(f"   geom={int(efc.con_geom[i])} dist={float(efc.con_dist[i]):.5f} pos={np.round(np.asarray(efc.con_pos[i]),4)}")
        nlim_mj = int(np.sum(env_ref.mj_data.efc_type == mujoco.mjtConstraint.mjCNSTR_LIMIT_JOINT))
        print(f"  mj limit rows: {nlim_mj}, ours active limits: {int(np.asarray(efc.active[:constraints.MAX_LIMITS]).sum())}")
        break
