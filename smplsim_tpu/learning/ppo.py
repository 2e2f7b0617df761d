"""On-device PPO: vmapped rollout collection + clipped-surrogate updates.

Replaces the reference's multiprocessing sampler (agents/agent.py:121-145,
36 worker processes pushing tuples through a Queue) and torch update loop
(agents/agent_ppo.py:20-108) with a single jitted train step: trajectories
stay in device memory as (T, B, ...) arrays, GAE is a reverse scan, and the
policy/value updates run minibatched epochs inside lax.scan. Multi-chip
data parallelism shards the B axis; gradient psums ride XLA collectives.

Hyperparameters mirror data/cfg/learning/simple_mlp.yaml: gamma 0.99,
tau 0.95, clip 0.2, 10 opt epochs, policy lr 5e-5, value lr 3e-4, fixed
log_std -2.5.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from smplsim_tpu.learning.gae import estimate_advantages
from smplsim_tpu.learning.nets import PolicyGaussian, ValueNet, gaussian_log_prob, sample_action
from smplsim_tpu.learning.running_norm import RunningNorm, norm_init, norm_update, normalize


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """learning/simple_mlp.yaml + agent defaults."""

    horizon: int = 32            # control steps per env per iteration
    num_envs: int = 1024
    gamma: float = 0.99
    tau: float = 0.95
    clip_epsilon: float = 0.2
    opt_num_epochs: int = 10
    num_minibatches: int = 4
    policy_lr: float = 5e-5
    value_lr: float = 3e-4
    max_grad_norm: float = 50.0   # agent_ppo.py:85-92 grad clip
    policy_widths: tuple = (2048, 1536, 1024, 1024, 512, 512)
    value_widths: tuple = (2048, 1536, 1024, 1024, 512, 512)
    activation: str = "silu"
    log_std: float = -2.5
    obs_clip: float = 5.0


class TrainState(struct.PyTreeNode):
    policy_params: Any
    value_params: Any
    policy_opt: Any
    value_opt: Any
    obs_norm: RunningNorm
    env_states: Any       # batched EnvState (B leading axis)
    rng: jax.Array
    epoch: jax.Array      # () int32


class PPO:
    """Functional PPO trainer bound to a functional env (envs.base API)."""

    def __init__(self, env, config: PPOConfig | None = None):
        self.env = env
        self.cfg = config or PPOConfig()
        self.policy = PolicyGaussian(
            action_dim=env.action_size,
            widths=self.cfg.policy_widths,
            activation=self.cfg.activation,
            log_std_init=self.cfg.log_std,
        )
        self.value = ValueNet(
            widths=self.cfg.value_widths, activation=self.cfg.activation
        )
        self.policy_tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.max_grad_norm),
            optax.adam(self.cfg.policy_lr),
        )
        self.value_tx = optax.chain(
            optax.clip_by_global_norm(self.cfg.max_grad_norm),
            optax.adam(self.cfg.value_lr),
        )

    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> TrainState:
        cfg = self.cfg
        k_pol, k_val, k_env, k_next = jax.random.split(key, 4)
        dummy_obs = jnp.zeros((1, self.env.obs_size), jnp.float32)
        policy_params = self.policy.init(k_pol, dummy_obs)
        value_params = self.value.init(k_val, dummy_obs)
        env_states = jax.vmap(self.env.reset)(
            jax.random.split(k_env, cfg.num_envs)
        )
        return TrainState(
            policy_params=policy_params,
            value_params=value_params,
            policy_opt=self.policy_tx.init(policy_params),
            value_opt=self.value_tx.init(value_params),
            obs_norm=norm_init(self.env.obs_size),
            env_states=env_states,
            rng=k_next,
            epoch=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def _rollout(self, ts: TrainState, key: jax.Array):
        """Collect (T, B) trajectories with the current policy."""
        vstep = jax.vmap(self.env.step_autoreset)

        def body(carry, k):
            env_states = carry
            obs = env_states.obs
            nobs = normalize(ts.obs_norm, obs, self.cfg.obs_clip)
            mean, log_std = self.policy.apply(ts.policy_params, nobs)
            action = sample_action(k, mean, log_std)
            logp = gaussian_log_prob(mean, log_std, action)
            nxt = vstep(env_states, jnp.clip(action, -1.0, 1.0))
            out = dict(
                obs=obs,
                action=action,
                logp=logp,
                reward=nxt.reward,
                terminated=nxt.terminated,
                done=nxt.done,
                nactive=nxt.info["nactive"],
                overflow=nxt.info["overflow"],
                stalled=nxt.info["stalled"],
            )
            return nxt, out

        keys = jax.random.split(key, self.cfg.horizon)
        env_states, traj = jax.lax.scan(body, ts.env_states, keys)
        return env_states, traj

    # ------------------------------------------------------------------
    def _losses(self, policy_params, value_params, batch, obs_norm):
        cfg = self.cfg
        nobs = normalize(obs_norm, batch["obs"], cfg.obs_clip)
        mean, log_std = self.policy.apply(policy_params, nobs)
        logp = gaussian_log_prob(mean, log_std, batch["action"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_epsilon, 1.0 + cfg.clip_epsilon) * adv
        policy_loss = -jnp.mean(jnp.minimum(surr1, surr2))

        v = self.value.apply(value_params, nobs)
        value_loss = jnp.mean(jnp.square(v - batch["ret"]))
        return policy_loss, value_loss

    # ------------------------------------------------------------------
    def train_step(self, ts: TrainState, axis_name: str | None = None):
        """One PPO iteration: rollout -> GAE -> minibatched epochs.

        axis_name: pmap/shard_map data axis for gradient pmean; None under
        single-device jit or when XLA inserts collectives from shardings.
        """
        cfg = self.cfg
        k_roll, k_perm, k_next = jax.random.split(ts.rng, 3)

        env_states, traj = self._rollout(ts, k_roll)

        # value targets under the CURRENT value net
        nobs_t = normalize(ts.obs_norm, traj["obs"], cfg.obs_clip)
        values = self.value.apply(ts.value_params, nobs_t)           # (T,B)
        last_nobs = normalize(ts.obs_norm, env_states.obs, cfg.obs_clip)
        last_value = self.value.apply(ts.value_params, last_nobs)    # (B,)

        not_done = 1.0 - traj["done"].astype(values.dtype)
        not_dead = 1.0 - traj["terminated"].astype(values.dtype)
        adv, ret = estimate_advantages(
            traj["reward"], values, last_value, not_done, not_dead,
            cfg.gamma, cfg.tau,
        )
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)

        # flatten (T,B) -> (N,)
        flat = {
            "obs": traj["obs"].reshape(-1, traj["obs"].shape[-1]),
            "action": traj["action"].reshape(-1, traj["action"].shape[-1]),
            "logp": traj["logp"].reshape(-1),
            "adv": adv.reshape(-1),
            "ret": ret.reshape(-1),
        }
        n = flat["logp"].shape[0]

        obs_norm = norm_update(ts.obs_norm, flat["obs"], axis_name)

        def epoch_body(carry, k):
            policy_params, value_params, policy_opt, value_opt = carry
            perm = jax.random.permutation(k, n)
            mb = n // cfg.num_minibatches

            def mb_body(carry, i):
                policy_params, value_params, policy_opt, value_opt = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                batch = {k2: v[idx] for k2, v in flat.items()}

                def ploss(p):
                    return self._losses(p, value_params, batch, ts.obs_norm)[0]

                def vloss(p):
                    return self._losses(policy_params, p, batch, ts.obs_norm)[1]

                pg = jax.grad(ploss)(policy_params)
                vg = jax.grad(vloss)(value_params)
                if axis_name is not None:
                    pg = jax.lax.pmean(pg, axis_name)
                    vg = jax.lax.pmean(vg, axis_name)
                pu, policy_opt = self.policy_tx.update(pg, policy_opt)
                vu, value_opt = self.value_tx.update(vg, value_opt)
                policy_params = optax.apply_updates(policy_params, pu)
                value_params = optax.apply_updates(value_params, vu)
                return (policy_params, value_params, policy_opt, value_opt), None

            carry, _ = jax.lax.scan(
                mb_body, carry, jnp.arange(cfg.num_minibatches)
            )
            return carry, None

        carry = (ts.policy_params, ts.value_params, ts.policy_opt, ts.value_opt)
        carry, _ = jax.lax.scan(
            epoch_body, carry, jax.random.split(k_perm, cfg.opt_num_epochs)
        )
        policy_params, value_params, policy_opt, value_opt = carry

        metrics = {
            "reward_mean": traj["reward"].mean(),
            "episode_done_frac": traj["done"].astype(values.dtype).mean(),
            "value_mean": values.mean(),
            # constraint-solver health: env-steps whose compact solve dropped
            # rows (forces approximate) and the deepest active-row count seen
            "efc_overflow_frac": traj["overflow"].astype(values.dtype).mean(),
            "qp_stalled_frac": traj["stalled"].astype(values.dtype).mean(),
            "nactive_max": traj["nactive"].max().astype(values.dtype),
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        return (
            TrainState(
                policy_params=policy_params,
                value_params=value_params,
                policy_opt=policy_opt,
                value_opt=value_opt,
                obs_norm=obs_norm,
                env_states=env_states,
                rng=k_next,
                epoch=ts.epoch + 1,
            ),
            metrics,
        )
