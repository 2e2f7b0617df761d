"""Isaac-path (nv) features: max-coords obs, history stacking, freeze masks,
nv termination, domain randomization, gym vector facade.

Obs parity oracle: an independent numpy implementation of
compute_humanoid_observations_smpl_max (reference nv/humanoid.py:2605-2702)
plus structural invariants (heading/translation invariance, v2 stacking).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smplsim_tpu import transforms as T
from smplsim_tpu.envs import (
    DomainRandConfig,
    DomainRandEnv,
    GymVectEnv,
    NoiseSpec,
    NvConfig,
    NvHumanoid,
    randomize_model,
)
from smplsim_tpu.envs.nv import (
    BodyHistory,
    compute_obs_max,
    compute_obs_max_v2,
    compute_obs_reduced,
    dof_to_obs_smpl,
    obs_max_size,
    obs_max_v2_size,
)
from smplsim_tpu.models import registry


# ---------------------------------------------------------------------------
# independent numpy oracle (wxyz quats)
# ---------------------------------------------------------------------------
def _np_qmul(a, b):
    w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(b, -1, 0)
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def _np_qrot(q, v):
    w, xyz = q[..., :1], q[..., 1:]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def _np_heading_inv(q):
    # yaw-only inverse: rotate x-axis, take atan2 of the xy projection
    ref = _np_qrot(q, np.array([1.0, 0, 0]))
    heading = np.arctan2(ref[..., 1], ref[..., 0])
    half = -heading / 2
    out = np.zeros(q.shape[:-1] + (4,))
    out[..., 0] = np.cos(half)
    out[..., 3] = np.sin(half)
    return out


def _np_tan_norm(q):
    tan = _np_qrot(q, np.array([1.0, 0, 0]))
    norm = _np_qrot(q, np.array([0.0, 0, 1.0]))
    return np.concatenate([tan, norm], axis=-1)


def _np_obs_max(pos, rot, vel, ang, local_root_obs=True, root_height_obs=True):
    J = pos.shape[0]
    h = np.broadcast_to(_np_heading_inv(rot[0]), (J, 4))
    local_pos = _np_qrot(h, pos - pos[0])
    rot_obs = _np_tan_norm(_np_qmul(h, rot))
    if not local_root_obs:
        rot_obs[0] = _np_tan_norm(rot[0])
    parts = []
    if root_height_obs:
        parts.append(pos[0, 2:3])
    parts += [local_pos[1:].reshape(-1), rot_obs.reshape(-1),
              _np_qrot(h, vel).reshape(-1), _np_qrot(h, ang).reshape(-1)]
    return np.concatenate(parts)


def _rand_state(rng, J):
    pos = rng.normal(size=(J, 3))
    pos[0, 2] = abs(pos[0, 2]) + 0.5
    rot = rng.normal(size=(J, 4))
    rot /= np.linalg.norm(rot, axis=-1, keepdims=True)
    rot[rot[:, 0] < 0] *= -1
    vel = rng.normal(size=(J, 3))
    ang = rng.normal(size=(J, 3))
    return pos, rot, vel, ang


# ---------------------------------------------------------------------------
def test_obs_max_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    pos, rot, vel, ang = _rand_state(rng, 24)
    for lro in (True, False):
        got = np.asarray(compute_obs_max(
            jnp.asarray(pos), jnp.asarray(rot), jnp.asarray(vel),
            jnp.asarray(ang), local_root_obs=lro, upright=True,
        ))
        want = _np_obs_max(pos, rot, vel, ang, local_root_obs=lro)
        np.testing.assert_allclose(got, want, atol=1e-12)
    assert got.shape[0] == obs_max_size(24)


def test_obs_max_heading_and_translation_invariant():
    rng = np.random.default_rng(1)
    pos, rot, vel, ang = _rand_state(rng, 10)
    obs0 = compute_obs_max(*map(jnp.asarray, (pos, rot, vel, ang)), upright=True)

    yaw = 1.3
    qz = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
    R = np.asarray(T.quat_to_matrix(jnp.asarray(qz)))
    pos2 = pos @ R.T + np.array([5.0, -3.0, 0.0])
    rot2 = _np_qmul(np.broadcast_to(qz, rot.shape), rot)
    vel2, ang2 = vel @ R.T, ang @ R.T
    obs1 = compute_obs_max(*map(jnp.asarray, (pos2, rot2, vel2, ang2)), upright=True)
    np.testing.assert_allclose(np.asarray(obs0), np.asarray(obs1), atol=1e-9)


def test_obs_max_v2_constant_history_tiles_v1_layout():
    rng = np.random.default_rng(2)
    pos, rot, vel, ang = _rand_state(rng, 8)
    Tn = 4
    hist = BodyHistory.init(*map(jnp.asarray, (pos, rot, vel, ang)), time_steps=Tn)
    obs = np.asarray(compute_obs_max_v2(
        hist.pos, hist.rot, hist.vel, hist.ang_vel, upright=True
    ))
    assert obs.shape[0] == obs_max_v2_size(8, Tn)
    per = obs.reshape(Tn, -1)
    for t in range(1, Tn):
        np.testing.assert_allclose(per[t], per[0], atol=1e-12)
    # frame layout matches the single-frame obs (root height leads each frame)
    single = np.asarray(compute_obs_max(
        *map(jnp.asarray, (pos, rot, vel, ang)), upright=True
    ))
    np.testing.assert_allclose(per[0], single, atol=1e-12)


def test_body_history_push_shifts():
    z = jnp.zeros((3, 3))
    q = jnp.zeros((3, 4)).at[:, 0].set(1.0)
    h = BodyHistory.init(z, q, z, z, time_steps=3)
    h2 = h.push(z + 1.0, q, z, z)
    assert float(h2.pos[-1, 0, 0]) == 1.0
    assert float(h2.pos[0, 0, 0]) == 0.0
    h3 = h2.push(z + 2.0, q, z, z)
    np.testing.assert_allclose(np.asarray(h3.pos[:, 0, 0]), [0.0, 1.0, 2.0])


def test_dof_to_obs_smpl():
    zero = np.asarray(dof_to_obs_smpl(jnp.zeros(9)))
    np.testing.assert_allclose(zero, np.tile([1, 0, 0, 0, 0, 1.0], 3), atol=1e-12)
    aa = jnp.asarray([0.3, -0.2, 0.9])
    got = np.asarray(dof_to_obs_smpl(aa))
    want = np.asarray(T.quat_to_tan_norm(T.exp_map_to_quat(aa)))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_obs_reduced_layout():
    rng = np.random.default_rng(3)
    J, K = 24, 4
    dof = rng.normal(size=((J - 1) * 3,))
    obs = compute_obs_reduced(
        jnp.asarray([0.0, 0.0, 0.9]), jnp.asarray([1.0, 0, 0, 0]),
        jnp.zeros(3), jnp.zeros(3), jnp.asarray(dof),
        jnp.asarray(rng.normal(size=((J - 1) * 3,))),
        jnp.asarray(rng.normal(size=(K, 3))), upright=True,
    )
    assert obs.shape[0] == 1 + 6 + 3 + 3 + (J - 1) * 6 + (J - 1) * 3 + K * 3


# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def model():
    return registry.default_humanoid(dtype=jnp.float64)


def test_nv_env_step(model):
    env = NvHumanoid(model, NvConfig(control_frequency_inv=2))
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape[0] == env.obs_size == obs_max_size(model.nbody)
    step = jax.jit(env.step)
    state = step(state, jnp.zeros(env.action_size))
    assert float(state.reward) == 1.0
    assert not bool(state.terminated)


def test_nv_env_obs_v2_history(model):
    cfg = NvConfig(control_frequency_inv=2, obs_v=2, past_track_steps=2)
    env = NvHumanoid(model, cfg)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape[0] == env.obs_size == obs_max_v2_size(model.nbody, 3)
    # at reset the history window is primed with the init frame -> all frames equal
    per = np.asarray(state.obs).reshape(3, -1)
    np.testing.assert_allclose(per[1], per[0], atol=1e-12)
    state = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    per = np.asarray(state.obs).reshape(3, -1)
    assert np.abs(per[2] - per[0]).max() > 0  # newest frame moved


def test_nv_termination_on_fall(model):
    cfg = NvConfig(control_frequency_inv=2, state_init="Fall",
                   episode_length=1000)
    env = NvHumanoid(model, cfg)
    state = jax.jit(env.reset)(jax.random.PRNGKey(3))
    step = jax.jit(env.step)
    terminated = False
    for _ in range(40):
        state = step(state, jnp.zeros(env.action_size))
        if bool(state.terminated):
            terminated = True
            break
    assert terminated, "fallen humanoid should trip the nv contact+height reset"


def test_freeze_masks(model):
    cfg = NvConfig(control_frequency_inv=2, freeze_hand=True, freeze_toe=True)
    env = NvHumanoid(model, cfg)
    mask = np.asarray(env.pd_target_mask())
    names = list(model.body_names)
    for n in ("L_Hand", "R_Hand", "L_Toe", "R_Toe"):
        d = (names.index(n) - 1) * 3
        assert (mask[d:d + 3] == 0).all(), n
    assert mask.sum() == mask.shape[0] - 12
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    state = jax.jit(env.step)(state, jnp.ones(env.action_size))
    assert np.isfinite(np.asarray(state.obs)).all()


# ---------------------------------------------------------------------------
def test_randomize_model_scaling(model):
    cfg = DomainRandConfig(
        body_mass=NoiseSpec(distribution="uniform", operation="scaling",
                            range=(0.8, 1.2)),
        friction=NoiseSpec(distribution="uniform", operation="scaling",
                           range=(0.9, 1.1)),
    )
    m2 = randomize_model(jax.random.PRNGKey(0), model, cfg)
    ratio = np.asarray(m2.body_mass / model.body_mass)
    assert ((ratio >= 0.8) & (ratio <= 1.2)).all()
    assert np.abs(ratio - 1).max() > 1e-3
    fi = ratio.reshape(ratio.shape + (1,) * (m2.body_inertia.ndim - 1))
    np.testing.assert_allclose(
        np.asarray(m2.body_inertia),
        np.asarray(model.body_inertia) * fi, rtol=1e-9,
    )
    # vmapped draw -> per-env physical realizations
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    batched = jax.vmap(lambda k: randomize_model(k, model, cfg))(keys)
    masses = np.asarray(batched.body_mass)
    assert masses.shape == (4, model.nbody)
    assert np.abs(masses[0] - masses[1]).max() > 1e-4


def test_noise_schedules():
    from smplsim_tpu.envs.domain_rand import apply_noise, schedule_scaling

    spec = NoiseSpec(distribution="gaussian", operation="additive",
                     range=(0.0, 0.05), schedule="linear", schedule_steps=100)
    assert float(schedule_scaling(spec, 0)) == 0.0
    assert float(schedule_scaling(spec, 50)) == pytest.approx(0.5)
    assert float(schedule_scaling(spec, 1000)) == 1.0
    x = jnp.ones(32)
    # at step 0 the linear schedule silences the noise entirely
    np.testing.assert_allclose(
        np.asarray(apply_noise(jax.random.PRNGKey(0), x, spec, 0)), 1.0,
        atol=1e-12,
    )
    noisy = np.asarray(apply_noise(jax.random.PRNGKey(0), x, spec, 100))
    assert np.abs(noisy - 1).max() > 1e-4


def test_domain_rand_env(model):
    from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig

    base = HumanoidSpeed(model, SpeedConfig(control_frequency_inv=2))
    cfg = DomainRandConfig(
        observations=NoiseSpec(distribution="gaussian", operation="additive",
                               range=(0.0, 0.01)),
        actions=NoiseSpec(distribution="gaussian", operation="additive",
                          range=(0.0, 0.01)),
        body_mass=NoiseSpec(distribution="uniform", operation="scaling",
                            range=(0.9, 1.1)),
    )
    dr = DomainRandEnv(base, cfg)
    state = jax.jit(dr.reset)(jax.random.PRNGKey(0))
    clean = jax.jit(base.reset)(jax.random.PRNGKey(0))
    state2 = jax.jit(dr.step_autoreset)(state, jnp.zeros(base.action_size))
    assert np.isfinite(np.asarray(state2.inner.obs)).all()
    # obs noise applied at reset
    assert np.abs(np.asarray(state.inner.obs) - np.asarray(clean.obs)).max() > 0
    # batched: each env gets its own physical realization
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    batch = jax.jit(jax.vmap(dr.reset))(keys)
    masses = np.asarray(batch.model.body_mass)
    assert np.abs(masses[0] - masses[1]).max() > 1e-4


# ---------------------------------------------------------------------------
def test_gym_vect_env(model):
    from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig

    env = HumanoidSpeed(
        model, SpeedConfig(control_frequency_inv=2, episode_length=3)
    )
    venv = GymVectEnv(env, num_envs=4, clip_observations=5.0)
    obs, info = venv.reset(seed=0)
    assert obs.shape == (4, env.obs_size)
    assert (np.abs(obs) <= 5.0).all()
    saw_final = False
    for _ in range(5):
        acts = np.zeros((4, env.action_size), np.float32)
        obs, rew, term, trunc, info = venv.step(acts)
        assert obs.shape == (4, env.obs_size)
        assert rew.shape == term.shape == trunc.shape == (4,)
        if "final_observation" in info:
            saw_final = True
    assert saw_final, "episode_length=3 must truncate within 5 steps"
