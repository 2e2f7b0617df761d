"""β-heterogeneous humanoid batches: N different-β robots stacked into one
batched RobotModel pytree and rolled out in a single vmap — the TPU-native
equivalent of the reference's per-env β-sampled MJCF robots
(smpl_sim/envs/nv/humanoid.py:1197-1229, 1298-1343)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplsim_tpu.body_model import SMPLParser
from smplsim_tpu.models import stack_models
from smplsim_tpu.models.builder import RobotConfig, build_robot_model
from tests.synthetic_body import make_synthetic_body

N_BETAS = 8


@pytest.fixture(scope="module")
def beta_batch():
    parser = SMPLParser(data=make_synthetic_body(np.random.RandomState(0), "smpl"))
    rng = np.random.RandomState(3)
    models = []
    for i in range(N_BETAS):
        betas = jnp.asarray(rng.randn(1, 10) * 0.8)
        m, _, _ = build_robot_model(parser, betas=betas, cfg=RobotConfig())
        models.append(m)
    return stack_models(models), models


def test_stack_models_shapes_and_variation(beta_batch):
    batched, models = beta_batch
    assert batched.body_pos.shape == (N_BETAS, models[0].nbody, 3)
    assert batched.parents == models[0].parents
    # the betas actually produced different bodies
    masses = np.asarray(batched.body_mass).sum(axis=1)
    assert np.std(masses) > 1e-3, masses


def test_stack_models_rejects_mismatched_topology(beta_batch):
    _, models = beta_batch
    bad = models[0].replace(humanoid_type="smplx")
    with pytest.raises(ValueError, match="static field"):
        stack_models([models[0], bad])


def test_beta_batch_rollout(beta_batch):
    """8 different-β humanoids step through the speed task in ONE vmap,
    each seeing its own body (distinct trajectories), all finite."""
    from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig

    batched, models = beta_batch
    env = HumanoidSpeed(models[0], SpeedConfig(control_frequency_inv=3))

    keys = jax.random.split(jax.random.PRNGKey(0), N_BETAS)
    reset = jax.jit(jax.vmap(lambda k, m: env.reset(k, model=m)))
    states = reset(keys, batched)

    vstep = jax.jit(jax.vmap(
        lambda s, a, m: env.step_autoreset(s, a, model=m)
    ))
    for i in range(5):
        a = jax.random.uniform(
            jax.random.PRNGKey(i), (N_BETAS, env.action_size),
            jnp.float32, minval=-0.3, maxval=0.3,
        )
        states = vstep(states, a, batched)

    qpos = np.asarray(states.phys.qpos)
    assert np.isfinite(qpos).all()
    assert np.isfinite(np.asarray(states.obs)).all()
    # different bodies must yield different states under identical actions
    d = np.abs(qpos[:, None] - qpos[None, :]).max(-1)
    off_diag = d[~np.eye(N_BETAS, dtype=bool)]
    assert off_diag.min() > 1e-4, "β variation had no dynamical effect"


def test_beta_batch_design_space_cem_flag(beta_batch):
    """DesignSpace vectors materialize a β-like batched model through
    vmapped unflatten — the CEM-over-morphology entry path."""
    from smplsim_tpu.models.design import DesignSpace

    _, models = beta_batch
    space = DesignSpace(models[0])
    vecs = jax.random.uniform(
        jax.random.PRNGKey(1), (4, space.dim), minval=-0.5, maxval=0.5
    )
    batch = jax.jit(jax.vmap(lambda v: space.unflatten(None, v)))(vecs)
    assert batch.geom_size.shape[0] == 4
    assert np.isfinite(np.asarray(batch.body_mass)).all()
