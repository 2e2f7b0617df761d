"""Free projectile spheres: EFC-coupled thrown-object perturbations.

The reference throws real free-flying projectile assets at the humanoid
(smpl_sim/envs/nv/humanoid.py:135-190 _load_proj_asset, :1989-2020 relaunch);
PhysX simulates the contact. Here spheres integrate ballistically inside the
control loop and couple through ordinary pyramidal EFC rows (body1 = -1
external side, sphere velocity in the row reference, sphere invmass in the
regularization), with the solved force applied equal-and-opposite to the
sphere — so a thrown ball genuinely shoves the humanoid AND bounces off.
"""
import jax
import jax.numpy as jnp
import numpy as np

from smplsim_tpu.envs.nv import NvConfig, NvHumanoid
from smplsim_tpu.models import registry
from smplsim_tpu.physics import constraints, engine


def _roll(model, ball_vx, steps=25):
    p_rad = jnp.asarray([0.12])
    p_inv = jnp.asarray([0.5])
    act = jnp.zeros(model.nu, jnp.float64)

    st = engine.init_state(model)
    st = st.replace(qpos=st.qpos.at[2].set(0.92))
    cache = engine.pd_cache(model, st) + (
        jnp.zeros(constraints.NEFC, jnp.float64),)
    pv = (jnp.asarray([[1.2, -0.2, 0.85]]),
          jnp.asarray([[ball_vx, 0.0, 0.0]]))

    def body(carry, _):
        st, cache, pp, pvv = carry
        st, info, power, cache, (pp, pvv) = engine.control_step(
            model, st, act, control_freq_inv=5, cache=cache,
            proj=(pp, pvv, p_rad, p_inv))
        return (st, cache, pp, pvv), (st.qpos[0], pvv[0, 0])

    (st, _, pp, pvv), (root_x, ball_vx_t) = jax.lax.scan(
        body, (st, cache) + pv, None, length=steps)
    return st, pp, pvv, root_x, ball_vx_t


def test_thrown_ball_shoves_humanoid_and_bounces():
    model = registry.default_humanoid(dtype=jnp.float64)
    roll = jax.jit(lambda v: _roll(model, v))
    st, pp, pvv, root_x, bvx = roll(-10.0)
    _, _, _, root_x0, _ = roll(0.0)

    assert np.isfinite(np.asarray(st.qpos)).all()
    # momentum transfer: the ball must NOT pass through (x-velocity reversed
    # or strongly damped by the contact)
    assert float(bvx[-1]) > -9.0, float(bvx[-1])
    # the humanoid is shoved along the throw direction (-x) relative to the
    # undisturbed rollout
    assert float(root_x[-1]) < float(root_x0[-1]) - 0.05, (
        float(root_x[-1]), float(root_x0[-1]))


def test_nv_env_projectiles_step_and_relaunch():
    """NvHumanoid with simulated projectiles: vmapped steps stay finite,
    proj state threads through EnvState, and the scheduler re-throws."""
    model = registry.default_humanoid(dtype=jnp.float32)
    env = NvHumanoid(model, NvConfig(
        num_projectiles=2, proj_interval=4, proj_speed=10.0,
        episode_length=50))
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(env.reset))(keys)
    assert states.proj is not None
    # parked far away at reset
    assert float(np.asarray(states.proj[0])[:, :, 0].min()) > 50.0

    vstep = jax.jit(jax.vmap(env.step))
    rng = np.random.RandomState(0)
    for t in range(6):
        a = jnp.asarray(rng.uniform(-0.2, 0.2, (B, env.action_size)),
                        jnp.float32)
        states = vstep(states, a)
        assert np.isfinite(np.asarray(states.obs)).all()
        assert np.isfinite(np.asarray(states.proj[0])).all()
    # after a throw tick the spheres are near the humanoid, not parked
    p = np.asarray(states.proj[0])
    assert np.abs(p[..., 0]).max() < 50.0, "scheduler never re-threw"


def test_projectile_vmap_matches_per_env():
    """The lanes spine's projectile handling (trailing-vmap EFC + lanes
    reaction/integration) matches the per-env reference loop."""
    model = registry.default_humanoid(dtype=jnp.float64)
    B = 3
    rng = np.random.RandomState(0)
    p_rad = jnp.asarray(np.full((B, 1), 0.12))
    p_inv = jnp.asarray(np.full((B, 1), 0.5))
    qpos = np.tile(np.asarray(model.qpos0), (B, 1))
    qpos[:, 2] = 0.92
    qvel = rng.randn(B, model.nv) * 0.1
    ppos = np.asarray([[[1.2, -0.2, 0.85]], [[0.9, 0.0, 0.9]],
                       [[-0.8, 0.1, 0.8]]])
    pvel = np.asarray([[[-9.0, 0, 0]], [[-7.0, 0.5, 0]], [[8.0, 0, 0.5]]])
    act = rng.uniform(-0.3, 0.3, (B, model.nu))

    def one(q, v, a, pp, pv, pr, pi):
        st = engine.PhysicsState(q, v)
        st2, info, power, cache, (pp2, pv2) = engine.control_step(
            model, st, a, control_freq_inv=4, proj=(pp, pv, pr, pi))
        return st2.qpos, st2.qvel, pp2, pv2, power

    J = jnp.asarray
    ref = [jax.jit(one)(J(qpos[i]), J(qvel[i]), J(act[i]), J(ppos[i]),
                        J(pvel[i]), p_rad[i], p_inv[i]) for i in range(B)]
    vm = jax.jit(jax.vmap(one))(J(qpos), J(qvel), J(act), J(ppos), J(pvel),
                                p_rad, p_inv)
    for i in range(B):
        for j, nm in enumerate(["qpos", "qvel", "ppos", "pvel", "power"]):
            r = np.asarray(ref[i][j])
            v = np.asarray(vm[j][i])
            err = np.max(np.abs(r - v) / (1 + np.abs(r)))
            assert err < 1e-9, (nm, i, err)
