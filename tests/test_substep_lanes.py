"""Lanes-last control-step spine vs the per-env reference loop.

The r5 spine (physics/substep_lanes.py) runs the WHOLE batched uhc_pd
control loop with the env axis in the lane dimension, through fused
factor+solve kernels and a trailing-vmap EFC assembly. These tests pin
vmap(engine.control_step) — which dispatches to the spine via custom_vmap —
against a python loop of per-env reference calls, in f64 (tight) and f32
(loose), on heterogeneous states including contact-rich lying poses.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smplsim_tpu.models import registry
from smplsim_tpu.physics import engine


def _states(model, B, contact_rich):
    rng = np.random.RandomState(3 if contact_rich else 0)
    qpos = np.tile(np.asarray(model.qpos0), (B, 1))
    if contact_rich:
        qpos[:, 2] = 0.15 + 0.05 * rng.rand(B)   # buried at the floor
        qpos[:, 3:7] = [0.7071068, 0.7071068, 0, 0]
    else:
        qpos[:, 2] = 0.9 + 0.1 * rng.rand(B)
    qpos[:, 7:] += rng.randn(B, model.nv - 6) * 0.1
    qvel = rng.randn(B, model.nv) * 0.2
    act = rng.uniform(-1, 1, (B, model.nu))
    return qpos, qvel, act


@pytest.mark.parametrize("dtype,tol,contact_rich", [
    (jnp.float64, 1e-9, False),
    (jnp.float64, 1e-9, True),
    (jnp.float32, 5e-3, False),
], ids=["f64-air", "f64-contact", "f32-air"])
def test_vmap_control_step_matches_per_env(dtype, tol, contact_rich):
    model = registry.default_humanoid(dtype=dtype)
    B = 4
    qpos, qvel, act = _states(model, B, contact_rich)
    J = lambda x: jnp.asarray(x, dtype)

    def one(q, v, a):
        st = engine.PhysicsState(J(q), J(v))
        st2, info, power, cache = engine.control_step(
            model, st, J(a), control_freq_inv=3)
        return (st2.qpos, st2.qvel, power, info.nactive_max,
                info.stalled_any, info.geom_floor_contact,
                cache[0], cache[1], cache[2])

    onej = jax.jit(one)
    ref = [onej(qpos[i], qvel[i], act[i]) for i in range(B)]
    vm = jax.jit(jax.vmap(one))(J(qpos), J(qvel), J(act))

    names = ["qpos", "qvel", "power", "nact", "stall", "gfc", "M", "C", "fw"]
    for i in range(B):
        for j, name in enumerate(names):
            r = np.asarray(ref[i][j]).astype(np.float64)
            v = np.asarray(vm[j][i]).astype(np.float64)
            err = np.max(np.abs(r - v) / (1.0 + np.abs(r)))
            assert err < tol, (name, i, err)
        # integer/bool channels must match exactly in f64
        if dtype == jnp.float64:
            assert int(ref[i][3]) == int(np.asarray(vm[3][i]))
            assert bool(ref[i][4]) == bool(np.asarray(vm[4][i]))


def test_closed_loop_spine_stays_on_reference(dtype=jnp.float64):
    """20 control steps of closed-loop (cache-carried) vmapped stepping
    track the per-env loop — the M/C/f_warm cache lifecycle crosses the
    custom_vmap boundary every step."""
    model = registry.default_humanoid(dtype=dtype)
    B = 2
    qpos, qvel, act = _states(model, B, False)
    J = lambda x: jnp.asarray(x, dtype)

    def roll(q, v):
        st = engine.PhysicsState(q, v)
        from smplsim_tpu.physics import constraints
        cache = engine.pd_cache(model, st) + (jnp.zeros(constraints.NEFC, dtype),)
        def body(carry, i):
            st, cache = carry
            a = 0.2 * jnp.sin(0.1 * i + jnp.arange(model.nu, dtype=dtype))
            st, _, _, cache = engine.control_step(
                model, st, a, control_freq_inv=2, cache=cache)
            return (st, cache), None
        (st, _), _ = jax.lax.scan(body, (st, cache), jnp.arange(20))
        return st.qpos, st.qvel

    rq, rv = jax.jit(roll)(J(qpos[0]), J(qvel[0]))
    vq, vv = jax.jit(jax.vmap(roll))(J(qpos), J(qvel))
    np.testing.assert_allclose(np.asarray(vq[0]), np.asarray(rq),
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(vv[0]), np.asarray(rv),
                               rtol=0, atol=1e-7)
