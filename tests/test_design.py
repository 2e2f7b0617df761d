"""Design-parameter space: flatten/unflatten round trips, jit/vmap, and
physics usability of perturbed models (reference smpl_local_robot.py
get_params/set_params with [-1,1] normalization, :322-1162)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smplsim_tpu.models import registry
from smplsim_tpu.models.design import DesignSpace


def test_zero_vector_is_identity():
    model = registry.default_humanoid(dtype=jnp.float64)
    space = DesignSpace(model)
    assert space.dim == len(space.names())
    m2 = space.unflatten(model, jnp.zeros(space.dim))
    # zero in [-1,1] maps to the geometric-mean ratio for log params (==1
    # for symmetric ranges) and zero offset for linear params
    np.testing.assert_allclose(
        np.asarray(m2.body_pos), np.asarray(model.body_pos), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(m2.dof_damping), np.asarray(model.dof_damping), rtol=1e-9
    )


def test_flatten_unflatten_roundtrip():
    model = registry.default_humanoid(dtype=jnp.float64)
    space = DesignSpace(model)
    rng = np.random.default_rng(0)
    vec = jnp.asarray(rng.uniform(-0.9, 0.9, space.dim))
    m2 = space.unflatten(model, vec)
    # model-space round trip: degenerate dims (zero-size capsule slots, the
    # pinned root offset) have no unique vector preimage, so compare models
    m3 = space.unflatten(model, space.flatten(m2))
    for f in ("dof_damping", "armature", "gear", "jkp", "jkd",
              "geom_size", "body_pos"):
        np.testing.assert_allclose(
            np.asarray(getattr(m3, f)), np.asarray(getattr(m2, f)),
            atol=1e-9, err_msg=f,
        )


@pytest.mark.full  # compile-heavy: full tier
def test_unflatten_jit_vmap_and_steps():
    """A batch of design vectors -> a batch of models; the engine steps a
    perturbed model (the on-device design-search building block)."""
    model = registry.default_humanoid(dtype=jnp.float64)
    space = DesignSpace(model)
    rng = np.random.default_rng(1)
    vecs = jnp.asarray(rng.uniform(-0.5, 0.5, (4, space.dim)))
    models = jax.jit(jax.vmap(lambda v: space.unflatten(model, v)))(vecs)
    assert models.gear.shape == (4,) + model.gear.shape

    from smplsim_tpu.physics import engine

    m1 = jax.tree.map(lambda a: a[0], models)  # statics survive tree.map
    st = engine.init_state(m1)
    st = st.replace(qpos=st.qpos.at[2].set(1.0))
    st2, info, power, cache = engine.control_step(
        m1, st, jnp.zeros(m1.nu, jnp.float64), control_freq_inv=2
    )
    assert np.isfinite(np.asarray(st2.qpos)).all()


@pytest.mark.full  # compile-heavy: full tier
def test_gradients_flow_through_design():
    """d(step outcome)/d(design vector) exists — gradient-based co-design."""
    model = registry.default_humanoid(dtype=jnp.float64)
    space = DesignSpace(model, {"gains": {"jkp": {"lb": 0.5, "ub": 2.0, "log": True}}})

    from smplsim_tpu.physics import engine

    def loss(vec):
        m = space.unflatten(model, vec)
        st = engine.init_state(m)
        st = st.replace(qpos=st.qpos.at[2].set(1.0))
        st2, _, _, _ = engine.control_step(
            m, st, jnp.full(m.nu, 0.1, jnp.float64), control_freq_inv=1
        )
        return jnp.sum(st2.qvel ** 2)

    # forward-mode: the physics kernels expose custom_jvp (iLQR-style);
    # reverse-mode would need transpose rules the custom_vmap ops don't have
    g = jax.jacfwd(loss)(jnp.zeros(space.dim))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
