"""Resync debug: per-control-step one-step error of our env vs reference.

Each step, copy the reference MjData state into our env state, step both once
with the same action, and measure the 1-step qpos/qvel error. Isolates
per-step solver error from chaotic accumulation.
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

import ref_shim

ref_shim.import_reference()
from smpl_sim.envs.tasks.humanoid_speed import HumanoidSpeed as RefSpeed  # noqa: E402

from smplsim_tpu.envs import HumanoidSpeed  # noqa: E402
from smplsim_tpu.models import registry  # noqa: E402
from smplsim_tpu.physics import engine  # noqa: E402
from smplsim_tpu.physics.engine import PhysicsState  # noqa: E402

t0 = time.time()
cfg = ref_shim.default_cfg(task="HumanoidSpeed")
env_ref = RefSpeed(cfg)
ref_shim.CURRENT_DATA[0] = env_ref.mj_data
env_ref.reset(seed=0)
env_ref._tar_speed = 2.0
env_ref._speed_change_steps = 10**9

model64 = registry.default_humanoid(dtype=jnp.float64)
ours = HumanoidSpeed(model64)
st = ours.reset(jax.random.PRNGKey(0))
st = st.replace(
    task=st.task.replace(tar_speed=jnp.float64(2.0), change_step=jnp.int32(10**9))
)
step = jax.jit(ours.step)
print("setup", time.time() - t0, flush=True)

rng = np.random.RandomState(7)
import mujoco

for t in range(30):
    # resync ours to the reference state (incl. the stale M/C cache: rebuild
    # fresh — both then share the same fresh prime for this step)
    qpos = env_ref.mj_data.qpos.copy()
    qvel = env_ref.mj_data.qvel.copy()
    mujoco.mj_forward(env_ref.mj_model, env_ref.mj_data)
    phys = PhysicsState(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    # kin=None: force step() to re-derive FK for the injected phys
    st = st.replace(phys=phys, pd_cache=engine.pd_cache(model64, phys), kin=None)

    a = rng.uniform(-0.3, 0.3, ours.action_size)
    obs_ref, rew_ref, term_ref, trunc_ref, _ = env_ref.step(a)
    st = step(st, jnp.asarray(a))
    dq = np.abs(np.asarray(st.phys.qpos) - env_ref.get_qpos())
    dv = np.abs(np.asarray(st.phys.qvel) - env_ref.get_qvel())
    ncon = env_ref.mj_data.ncon
    print(
        f"t={t:3d} dq={dq.max():.3e}@{dq.argmax():3d} dv={dv.max():.3e}@{dv.argmax():3d} "
        f"rew d={abs(float(st.reward)-rew_ref):.2e} ncon={ncon}",
        flush=True,
    )
    if term_ref:
        print("ref terminated", flush=True)
        break
print("done", time.time() - t0)
