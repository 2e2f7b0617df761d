"""PolicyMCP, One-Euro filter, RunningMeanStd freeze modes, episode stats,
MANO tables (the smaller reference components)."""
import numpy as np

import jax
import jax.numpy as jnp

from smplsim_tpu.learning.episode_stats import stats_init, stats_step, stats_summary
from smplsim_tpu.learning.nets import PolicyMCP
from smplsim_tpu.utils.filters import (
    one_euro_filter,
    rms_freeze,
    rms_freeze_partial,
    rms_init,
    rms_normalize,
    rms_update,
)


def test_policy_mcp_shapes_and_blend():
    net = PolicyMCP(action_dim=6, num_primitive=3, widths=(32,),
                    composer_widths=(16,))
    obs = jnp.ones((4, 10))
    params = net.init(jax.random.PRNGKey(0), obs)
    mean, log_std = net.apply(params, obs)
    assert mean.shape == (4, 6) and log_std.shape == (4, 6)
    np.testing.assert_allclose(np.asarray(log_std), -2.5)
    # composer weights change the blend: different obs -> different means
    mean2, _ = net.apply(params, obs * -3.0)
    assert np.abs(np.asarray(mean) - np.asarray(mean2)).max() > 0


def test_one_euro_matches_reference_impl():
    # scalar reference implementation (utils/one_euor_filter.py)
    import math

    def ref_filter(ts, xs, min_cutoff=1.0, beta=0.05, d_cutoff=1.0):
        out = [xs[0]]
        x_prev, dx_prev, t_prev = xs[0], 0.0, ts[0]
        for t, x in zip(ts[1:], xs[1:]):
            t_e = t - t_prev
            r = 2 * math.pi * d_cutoff * t_e
            a_d = r / (r + 1)
            dx = (x - x_prev) / t_e
            dx_hat = a_d * dx + (1 - a_d) * dx_prev
            cutoff = min_cutoff + beta * abs(dx_hat)
            r = 2 * math.pi * cutoff * t_e
            a = r / (r + 1)
            x_hat = a * x + (1 - a) * x_prev
            out.append(x_hat)
            x_prev, dx_prev, t_prev = x_hat, dx_hat, t
        return np.asarray(out)

    rng = np.random.default_rng(0)
    ts = np.arange(50) / 30.0
    xs = np.sin(ts * 3) + rng.normal(size=50) * 0.1
    got = np.asarray(one_euro_filter(jnp.asarray(ts), jnp.asarray(xs), beta=0.05))
    want = ref_filter(ts, xs, beta=0.05)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # smoother than the input
    assert np.abs(np.diff(got)).mean() < np.abs(np.diff(xs)).mean()


def test_rms_freeze_modes():
    rng = np.random.default_rng(1)
    s = rms_init((3,))
    b1 = jnp.asarray(rng.normal(2.0, 3.0, (512, 3)).astype(np.float32))
    s = rms_update(s, b1)
    np.testing.assert_allclose(np.asarray(s.mean), 2.0, atol=0.5)

    frozen = rms_freeze(s)
    frozen2 = rms_update(frozen, b1 * 100)
    np.testing.assert_allclose(np.asarray(frozen2.mean), np.asarray(s.mean))

    part = rms_freeze_partial(s)
    part = rms_update(part, jnp.asarray(rng.normal(50.0, 1.0, (512, 3)).astype(np.float32)))
    # stats kept accumulating...
    assert np.asarray(part.mean).mean() > 10
    # ...but normalization uses the snapshot
    x = jnp.asarray([2.0, 2.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(rms_normalize(part, x)),
        np.asarray(rms_normalize(s, x)), atol=1e-6,
    )


def test_episode_stats():
    s = stats_init(2)
    rews = [(1.0, 1.0), (1.0, 1.0), (1.0, 1.0)]
    dones = [(False, False), (False, True), (True, False)]
    for r, d in zip(rews, dones):
        s = stats_step(s, jnp.asarray(r), jnp.asarray(d))
    out = {k: float(v) for k, v in stats_summary(s).items()}
    assert out["num_episodes"] == 2
    assert out["avg_episode_reward"] == 2.5  # episodes of return 2 and 3
    assert out["avg_episode_len"] == 2.5
    assert out["max_episode_reward"] == 3.0
    assert out["min_episode_reward"] == 2.0


def test_mano_tables():
    from smplsim_tpu.body_model.smpl import _NUM_JOINTS, _NUM_POSE
    from smplsim_tpu.motion.joint_names import (
        MANO_LEFT_BONE_ORDER_NAMES,
        MANO_RIGHT_BONE_ORDER_NAMES,
    )

    assert _NUM_JOINTS["mano"] == 16 and _NUM_POSE["mano"] == 48
    assert len(MANO_LEFT_BONE_ORDER_NAMES) == 16
    assert MANO_LEFT_BONE_ORDER_NAMES[0] == "L_Wrist"
    assert MANO_RIGHT_BONE_ORDER_NAMES[5] == "R_Middle2"
