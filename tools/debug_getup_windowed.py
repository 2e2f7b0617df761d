"""Run the windowed getup parity loop with per-step error prints to find
where the (previously green) 15-step-window gate now diverges."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
import ref_shim  # noqa: E402

ref_shim.import_reference()
import smpl_sim  # noqa: F401

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from smplsim_tpu.envs import GetupConfig, HumanoidGetup  # noqa: E402
from smplsim_tpu.models import registry  # noqa: E402
from smplsim_tpu.physics import constraints, engine  # noqa: E402
from smplsim_tpu.physics.engine import PhysicsState  # noqa: E402

model64 = registry.default_humanoid(dtype=jnp.float64)

cfg = ref_shim.default_cfg(task="HumanoidGetup", state_init="Fall")
from smpl_sim.envs.tasks.humanoid_getup import HumanoidGetup as RefGetup  # noqa: E402

env_ref = RefGetup(cfg)
ref_shim.CURRENT_DATA[0] = env_ref.mj_data
env_ref.reset(seed=3)
env_ref.reset(seed=3)

ours = HumanoidGetup(model64, GetupConfig(state_init="Default"))
st = ours.reset(jax.random.PRNGKey(0))
env_ref._tar_height[:] = 0.9
env_ref._height_change_steps = 10**9
st = st.replace(task=st.task.replace(
    tar_height=jnp.asarray(0.9, jnp.float64),
    change_step=jnp.asarray(10**9, jnp.int32),
    recovery_counter=jnp.asarray(ours.config.recovery_steps, jnp.int32),
))

step = jax.jit(ours.step)
rng = np.random.RandomState(11)
worst = 0.0
import mujoco  # noqa: E402

for t in range(150):
    if t % 15 == 0:
        # align controller caches: our inject rebuilds (M, C) fresh at the
        # synced state; the reference's mjData still holds the previous
        # substep's (stale) qM/qfrc_bias, which its stable-PD reads.
        # mj_forward refreshes the reference to the same fresh semantics.
        mujoco.mj_forward(env_ref.mj_model, env_ref.mj_data)
        phys = PhysicsState(
            qpos=jnp.asarray(env_ref.get_qpos().copy()),
            qvel=jnp.asarray(env_ref.get_qvel().copy()),
        )
        cache = engine.pd_cache(model64, phys) + (
            jnp.zeros(constraints.NEFC, jnp.float64),
        )
        st = st.replace(phys=phys, pd_cache=cache, kin=None)
    a = rng.uniform(-0.3, 0.3, ours.action_size)
    obs_ref, rew_ref, term_ref, trunc_ref, _ = env_ref.step(a)
    st = step(st, jnp.asarray(a))
    qpos_ref = env_ref.get_qpos()
    err = np.abs(np.asarray(st.phys.qpos) - qpos_ref).max()
    rerr = abs(float(st.reward) - rew_ref)
    flag = " <<<" if (err > 1e-2 or rerr > 5e-3) else ""
    if err > worst or flag or t % 15 == 14:
        print(f"t={t:3d} qpos_err={err:.3e} rew_err={rerr:.3e} "
              f"nactive={int(st.info['nactive'])}{flag}")
    worst = max(worst, err)
    if bool(st.terminated) != bool(term_ref):
        print(f"t={t}: terminated mismatch ours={bool(st.terminated)} ref={bool(term_ref)}")
    if term_ref:
        print("ref terminated")
        break
print("worst", worst)
