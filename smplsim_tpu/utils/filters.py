"""Signal filters: One-Euro filter + running mean/std with freeze modes.

Rebuilds of smpl_sim/utils/one_euor_filter.py (scalar/array One-Euro filter,
here as a pure scan-friendly JAX function) and utils/running_mean_std.py
(RunningMeanStd with freeze / partial "til-now" freeze semantics, :9-110).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# One-Euro filter (Casiez et al.): jit/scan-friendly functional form
# ---------------------------------------------------------------------------
class OneEuroState(struct.PyTreeNode):
    x_prev: jax.Array
    dx_prev: jax.Array
    t_prev: jax.Array


def one_euro_init(t0, x0, dx0=None) -> OneEuroState:
    x0 = jnp.asarray(x0)
    return OneEuroState(
        x_prev=x0,
        dx_prev=jnp.zeros_like(x0) if dx0 is None else jnp.asarray(dx0),
        t_prev=jnp.asarray(t0, x0.dtype),
    )


def _smoothing_factor(t_e, cutoff):
    r = 2.0 * jnp.pi * cutoff * t_e
    return r / (r + 1.0)


def one_euro_step(
    state: OneEuroState,
    t,
    x,
    min_cutoff: float = 1.0,
    beta: float = 0.0,
    d_cutoff: float = 1.0,
):
    """One filter update; returns (state', x_hat). Use under lax.scan for
    sequences. Matches the reference OneEuroFilter.__call__ exactly."""
    x = jnp.asarray(x)
    t = jnp.asarray(t, x.dtype)
    t_e = t - state.t_prev
    a_d = _smoothing_factor(t_e, d_cutoff)
    dx = (x - state.x_prev) / t_e
    dx_hat = a_d * dx + (1.0 - a_d) * state.dx_prev
    cutoff = min_cutoff + beta * jnp.abs(dx_hat)
    a = _smoothing_factor(t_e, cutoff)
    x_hat = a * x + (1.0 - a) * state.x_prev
    return OneEuroState(x_prev=x_hat, dx_prev=dx_hat, t_prev=t), x_hat


def one_euro_filter(ts, xs, min_cutoff: float = 1.0, beta: float = 0.0,
                    d_cutoff: float = 1.0):
    """Filter a whole sequence xs (T, ...) sampled at times ts (T,)."""
    state = one_euro_init(ts[0], xs[0])

    def body(state, tx):
        t, x = tx
        return one_euro_step(state, t, x, min_cutoff, beta, d_cutoff)

    _, out = jax.lax.scan(body, state, (ts[1:], xs[1:]))
    return jnp.concatenate([xs[:1], out], axis=0)


# ---------------------------------------------------------------------------
# RunningMeanStd with freeze / partial freeze (utils/running_mean_std.py)
# ---------------------------------------------------------------------------
class RunningMeanStd(struct.PyTreeNode):
    mean: jax.Array
    var: jax.Array
    count: jax.Array
    # 0 = live, 1 = frozen (no updates), 2 = partially frozen: stats continue
    # to accumulate but normalization uses the snapshot taken at freeze time
    mode: jax.Array
    frozen_mean: jax.Array
    frozen_var: jax.Array


def rms_init(shape, dtype=jnp.float32, epsilon: float = 1e-4) -> RunningMeanStd:
    z = jnp.zeros(shape, dtype)
    o = jnp.ones(shape, dtype)
    return RunningMeanStd(
        mean=z, var=o, count=jnp.asarray(epsilon, dtype),
        mode=jnp.zeros((), jnp.int32), frozen_mean=z, frozen_var=o,
    )


def rms_update(s: RunningMeanStd, batch: jax.Array) -> RunningMeanStd:
    """Chan parallel-variance update over the leading axis; no-op if frozen."""
    bmean = batch.mean(axis=0)
    bvar = batch.var(axis=0)
    bcount = batch.shape[0]
    delta = bmean - s.mean
    tot = s.count + bcount
    new_mean = s.mean + delta * bcount / tot
    m_a = s.var * s.count
    m_b = bvar * bcount
    M2 = m_a + m_b + jnp.square(delta) * s.count * bcount / tot
    new_var = M2 / tot
    live = s.mode != 1
    return s.replace(
        mean=jnp.where(live, new_mean, s.mean),
        var=jnp.where(live, new_var, s.var),
        count=jnp.where(live, tot, s.count),
    )


def rms_freeze(s: RunningMeanStd) -> RunningMeanStd:
    return s.replace(mode=jnp.asarray(1, jnp.int32))


def rms_freeze_partial(s: RunningMeanStd) -> RunningMeanStd:
    """Snapshot stats for normalization; accumulation continues."""
    return s.replace(
        mode=jnp.asarray(2, jnp.int32), frozen_mean=s.mean, frozen_var=s.var
    )


def rms_unfreeze(s: RunningMeanStd) -> RunningMeanStd:
    return s.replace(mode=jnp.asarray(0, jnp.int32))


def rms_normalize(s: RunningMeanStd, x: jax.Array, clip: float = 10.0,
                  eps: float = 1e-8) -> jax.Array:
    partial = s.mode == 2
    mean = jnp.where(partial, s.frozen_mean, s.mean)
    var = jnp.where(partial, s.frozen_var, s.var)
    return jnp.clip((x - mean) / jnp.sqrt(var + eps), -clip, clip)


def rms_denormalize(s: RunningMeanStd, x: jax.Array, eps: float = 1e-8) -> jax.Array:
    partial = s.mode == 2
    mean = jnp.where(partial, s.frozen_mean, s.mean)
    var = jnp.where(partial, s.frozen_var, s.var)
    return x * jnp.sqrt(var + eps) + mean
