"""Domain randomization: observation/action noise + physical-property scaling.

Functional rebuild of the reference's Isaac-path `apply_randomizations`
(smpl_sim/envs/nv/base_task.py:697-968). The reference mutates PhysX actor
properties and installs noise lambdas on the live task object; here everything
is a pure function of a PRNG key:

  * `apply_noise(key, x, spec, step, corr)` reproduces the reference noise
    lambdas — gaussian/uniform, additive/scaling, linear/constant annealing
    schedule, with an optional *correlated* component `corr` sampled once per
    randomization round and held (base_task.py:731-817).
  * `randomize_model(key, model, cfg)` returns a RobotModel with scaled
    masses/inertias, friction, damping, armature, and PD gains — the analogue
    of the rigid-body/dof property setters (base_task.py:868-957). It is a
    pytree->pytree map, so `jax.vmap(randomize_model, (0, None, None))` yields
    a *batched model* with one physical realization per env; env.reset/step
    accept such a model via their `model=` argument.
  * `DomainRandEnv` composes the two around any HumanoidEnv: per-episode model
    resampling at reset (frequency-gated), per-step obs/action noise.

Schedules reference an absolute step count, passed explicitly (the reference
uses gym frame count, base_task.py:705).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from smplsim_tpu.envs.base import EnvState, HumanoidEnv
from smplsim_tpu.models.spec import RobotModel


@dataclasses.dataclass(frozen=True)
class NoiseSpec:
    """One randomization entry (base_task.py dr_params[...])."""

    distribution: str = "gaussian"        # "gaussian" | "uniform"
    operation: str = "additive"           # "additive" | "scaling"
    range: tuple[float, float] = (0.0, 0.0)            # (mu, var) | (lo, hi)
    range_correlated: tuple[float, float] = (0.0, 0.0)
    schedule: str | None = None           # None | "linear" | "constant"
    schedule_steps: int = 1


@dataclasses.dataclass(frozen=True)
class DomainRandConfig:
    """What to randomize. None entries are untouched."""

    frequency: int = 1                     # env resets between model redraws
    observations: NoiseSpec | None = None
    actions: NoiseSpec | None = None
    # physical properties (operation/scale semantics of NoiseSpec):
    body_mass: NoiseSpec | None = None
    friction: NoiseSpec | None = None
    dof_damping: NoiseSpec | None = None
    armature: NoiseSpec | None = None
    pd_gains: NoiseSpec | None = None
    gravity: NoiseSpec | None = None


def schedule_scaling(spec: NoiseSpec, step) -> jax.Array:
    """Annealing factor (base_task.py:747-752): linear ramps 0->1 over
    schedule_steps; constant switches 0->1 at schedule_steps."""
    step = jnp.asarray(step, jnp.float32)
    if spec.schedule == "linear":
        return jnp.minimum(step, spec.schedule_steps) / spec.schedule_steps
    if spec.schedule == "constant":
        return jnp.where(step < spec.schedule_steps, 0.0, 1.0)
    return jnp.ones((), jnp.float32)


def _sample(key, shape, spec: NoiseSpec, sched, correlated: bool, dtype):
    """One noise draw with the reference's schedule semantics
    (base_task.py:754-817): additive -> params scaled by sched; scaling ->
    variance scaled and mean pulled toward 1."""
    lo, hi = (spec.range_correlated if correlated else spec.range)
    sched = jnp.asarray(sched, dtype)
    if spec.distribution == "gaussian":
        mu, var = jnp.asarray(lo, dtype), jnp.asarray(hi, dtype)
        if spec.operation == "additive":
            mu, var = mu * sched, var * sched
        else:
            var = var * sched
            mu = mu * sched + (1.0 - sched)
        return mu + jax.random.normal(key, shape, dtype) * var
    elif spec.distribution == "uniform":
        lo, hi = jnp.asarray(lo, dtype), jnp.asarray(hi, dtype)
        if spec.operation == "additive":
            lo, hi = lo * sched, hi * sched
        else:
            lo = lo * sched + (1.0 - sched)
            hi = hi * sched + (1.0 - sched)
        return jax.random.uniform(key, shape, dtype, minval=lo, maxval=hi)
    raise NotImplementedError(spec.distribution)


def sample_correlated(key, shape, spec: NoiseSpec, step, dtype=jnp.float32):
    """The held 'corr' component, redrawn once per randomization round."""
    return _sample(key, shape, spec, schedule_scaling(spec, step), True, dtype)


def apply_noise(key, x: jax.Array, spec: NoiseSpec, step, corr=None) -> jax.Array:
    """Reference noise_lambda (base_task.py:777-787): op(x, corr + fresh)."""
    sched = schedule_scaling(spec, step)
    noise = _sample(key, x.shape, spec, sched, False, x.dtype)
    if corr is not None:
        noise = noise + corr
    return x + noise if spec.operation == "additive" else x * noise


def _scale_field(key, arr, spec: NoiseSpec, step):
    f = _sample(key, arr.shape, spec, schedule_scaling(spec, step), False, arr.dtype)
    return arr + f if spec.operation == "additive" else arr * f


def randomize_model(
    key: jax.Array, model: RobotModel, cfg: DomainRandConfig, step=0
) -> RobotModel:
    """Physical-property randomization -> new RobotModel (pure; vmap over keys
    for a per-env batched model)."""
    ks = jax.random.split(key, 6)
    out = model
    if cfg.body_mass is not None:
        f = _sample(ks[0], model.body_mass.shape, cfg.body_mass,
                    schedule_scaling(cfg.body_mass, step), False,
                    model.body_mass.dtype)
        if cfg.body_mass.operation == "additive":
            out = out.replace(body_mass=model.body_mass + f)
        else:
            # inertia scales with mass for a fixed geometry
            fi = f.reshape(f.shape + (1,) * (model.body_inertia.ndim - f.ndim))
            out = out.replace(
                body_mass=model.body_mass * f,
                body_inertia=model.body_inertia * fi,
            )
    if cfg.friction is not None:
        out = out.replace(
            geom_friction=_scale_field(ks[1], model.geom_friction, cfg.friction, step),
            floor_friction=_scale_field(ks[1], model.floor_friction, cfg.friction, step),
        )
    if cfg.dof_damping is not None:
        out = out.replace(
            dof_damping=_scale_field(ks[2], model.dof_damping, cfg.dof_damping, step)
        )
    if cfg.armature is not None:
        out = out.replace(
            armature=_scale_field(ks[3], model.armature, cfg.armature, step)
        )
    if cfg.pd_gains is not None:
        out = out.replace(
            jkp=_scale_field(ks[4], model.jkp, cfg.pd_gains, step),
            jkd=_scale_field(ks[4], model.jkd, cfg.pd_gains, step),
        )
    if cfg.gravity is not None:
        out = out.replace(
            gravity=_scale_field(ks[5], model.gravity, cfg.gravity, step)
        )
    return out


class DRState(struct.PyTreeNode):
    """EnvState + the per-episode physical realization and held noise."""

    inner: EnvState
    model: RobotModel          # randomized arrays (static fields shared)
    corr_obs: jax.Array | None
    corr_act: jax.Array | None
    resets: jax.Array          # () int32, counts resets for frequency gating
    step_count: jax.Array      # () int32, absolute env steps (schedules)


class DomainRandEnv:
    """Wrap any HumanoidEnv with domain randomization. Pure functions like the
    base env; vmap the whole wrapper for batches."""

    def __init__(self, env: HumanoidEnv, cfg: DomainRandConfig):
        self.env = env
        self.cfg = cfg

    def __getattr__(self, name):
        return getattr(self.env, name)

    def _corr(self, key, state_like, step):
        cfg = self.cfg
        k_o, k_a = jax.random.split(key)
        corr_obs = (
            sample_correlated(k_o, (self.env.obs_size,), cfg.observations, step)
            if cfg.observations is not None else None
        )
        corr_act = (
            sample_correlated(k_a, (self.env.action_size,), cfg.actions, step)
            if cfg.actions is not None else None
        )
        return corr_obs, corr_act

    def reset(self, key: jax.Array) -> DRState:
        k_model, k_corr, k_env = jax.random.split(key, 3)
        step0 = jnp.zeros((), jnp.int32)
        model = randomize_model(k_model, self.env.model, self.cfg, step0)
        inner = self.env.reset(k_env, model)
        corr_obs, corr_act = self._corr(k_corr, inner, step0)
        if corr_obs is not None:
            inner = inner.replace(obs=apply_noise(
                jax.random.fold_in(k_corr, 1), inner.obs,
                self.cfg.observations, step0, corr_obs,
            ))
        return DRState(
            inner=inner, model=model, corr_obs=corr_obs, corr_act=corr_act,
            resets=jnp.zeros((), jnp.int32), step_count=step0,
        )

    def step(self, state: DRState, action: jax.Array) -> DRState:
        cfg = self.cfg
        k_act, k_obs = jax.random.split(
            jax.random.fold_in(state.inner.rng, 17)
        )
        if cfg.actions is not None:
            action = apply_noise(
                k_act, action, cfg.actions, state.step_count, state.corr_act
            )
        inner = self.env.step(state.inner, action, state.model)
        if cfg.observations is not None:
            inner = inner.replace(obs=apply_noise(
                k_obs, inner.obs, cfg.observations, state.step_count,
                state.corr_obs,
            ))
        return state.replace(inner=inner, step_count=state.step_count + 1)

    def step_autoreset(self, state: DRState, action: jax.Array) -> DRState:
        """Step; done envs reset in place, redrawing the physical realization
        every `frequency` resets (base_task.py randomize_buf gating)."""
        nxt = self.step(state, action)
        done = nxt.inner.done
        resets = state.resets + done.astype(jnp.int32)
        redraw = done & (resets % max(self.cfg.frequency, 1) == 0)

        k_reset = jax.random.fold_in(nxt.inner.rng, 23)
        k_model, k_corr, k_env = jax.random.split(k_reset, 3)
        new_model = randomize_model(k_model, self.env.model, self.cfg,
                                    nxt.step_count)
        model = jax.tree.map(
            lambda a, b: jnp.where(redraw, a, b), new_model, nxt.model
        )
        fresh_inner = self.env.reset(k_env, model)
        fresh_inner = fresh_inner.replace(
            reward=nxt.inner.reward,
            terminated=nxt.inner.terminated,
            truncated=nxt.inner.truncated,
            info=nxt.inner.info,
        )
        corr_obs, corr_act = self._corr(k_corr, fresh_inner, nxt.step_count)
        pick = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(done, x, y), a, b
        )
        inner = pick(fresh_inner, nxt.inner)
        out = DRState(
            inner=inner, model=model,
            corr_obs=None if corr_obs is None else pick(corr_obs, nxt.corr_obs),
            corr_act=None if corr_act is None else pick(corr_act, nxt.corr_act),
            resets=resets, step_count=nxt.step_count,
        )
        return out
