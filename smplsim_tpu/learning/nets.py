"""Policy / value networks (flax), mirroring the reference learning stack:

  * MLP with configurable widths/activation (reference learning/mlp.py:36-60;
    default [2048,1536,1024,1024,512,512] silu from
    data/cfg/learning/simple_mlp.yaml)
  * PolicyGaussian: normalized obs -> MLP -> mean head; fixed log_std
    parameter (learning/policy_gaussian.py:13-41, fixed_std log_std=-2.5)
  * ValueNet: MLP -> scalar head with 0.1-scaled final init
    (learning/critic.py:5-19)
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

_ACT = {
    "silu": nn.silu,
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "gelu": nn.gelu,
    "elu": nn.elu,
}


class MLP(nn.Module):
    widths: Sequence[int]
    activation: str = "silu"

    @nn.compact
    def __call__(self, x):
        act = _ACT[self.activation]
        for w in self.widths:
            x = act(nn.Dense(w)(x))
        return x


class PolicyGaussian(nn.Module):
    """Diagonal Gaussian policy with state-independent log_std."""

    action_dim: int
    widths: Sequence[int] = (2048, 1536, 1024, 1024, 512, 512)
    activation: str = "silu"
    log_std_init: float = -2.5
    fixed_std: bool = True

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.widths, self.activation)(obs)
        mean = nn.Dense(self.action_dim)(h)
        log_std = self.param(
            "log_std",
            # explicit dtype: a weak-typed init would retrace the train step
            # after the first optimizer update changes it to strong
            lambda key, shape: jnp.full(shape, self.log_std_init, jnp.float32),
            (self.action_dim,),
        )
        if self.fixed_std:
            log_std = jax.lax.stop_gradient(log_std)
        return mean, jnp.broadcast_to(log_std, mean.shape)


class PolicyMCP(nn.Module):
    """Multiplicative composition policy (reference learning/policy_mcp.py:8-36):
    N primitive MLP mean heads blended by a softmax composer network; shared
    state-independent log_std."""

    action_dim: int
    num_primitive: int = 4
    widths: Sequence[int] = (2048, 1536, 1024, 1024, 512, 512)
    composer_widths: Sequence[int] = (300, 200)
    activation: str = "silu"
    log_std_init: float = -2.5
    fixed_std: bool = True

    @nn.compact
    def __call__(self, obs):
        means = []
        for _ in range(self.num_primitive):
            h = MLP(self.widths, self.activation)(obs)
            # 0.1-scaled mean head like the reference primitives
            means.append(nn.Dense(
                self.action_dim,
                kernel_init=nn.initializers.variance_scaling(
                    0.01, "fan_in", "truncated_normal"
                ),
            )(h))
        x_all = jnp.stack(means, axis=-2)                 # (..., N, A)
        hc = MLP(self.composer_widths, self.activation)(obs)
        w = nn.softmax(nn.Dense(self.num_primitive)(hc), axis=-1)
        mean = jnp.sum(w[..., None] * x_all, axis=-2)     # (..., A)
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.log_std_init, jnp.float32),
            (self.action_dim,),
        )
        if self.fixed_std:
            log_std = jax.lax.stop_gradient(log_std)
        return mean, jnp.broadcast_to(log_std, mean.shape)


class ValueNet(nn.Module):
    widths: Sequence[int] = (2048, 1536, 1024, 1024, 512, 512)
    activation: str = "silu"

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.widths, self.activation)(obs)
        v = nn.Dense(
            1,
            kernel_init=nn.initializers.variance_scaling(
                0.01, "fan_in", "truncated_normal"
            ),
        )(h)
        return v.squeeze(-1)


class PolicyPNN(nn.Module):
    """Progressive-primitive policy (the reference's `amp_pnn` network,
    data/cfg/train/rlg/im_pnn.yaml + num_prim: 4 in phc_kp_pnn_iccv.yaml;
    the net itself lives in the external PHC/rl_games package — this is the
    TPU-native mirror).

    N primitive MLPs are evaluated in parallel; `active` selects which
    primitive drives the Gaussian head. Progressive training: primitives
    before `active` are frozen with stop_gradient (lateral knowledge stays,
    gradients only reach the newest column), matching PNN curriculum
    training. Call with `active=None` to get all primitive means stacked
    (..., N, A) for a downstream composer (PolicyMCP distillation)."""

    action_dim: int
    num_primitive: int = 4
    widths: Sequence[int] = (1024, 512)
    activation: str = "relu"
    log_std_init: float = -2.9
    fixed_std: bool = True

    @nn.compact
    def __call__(self, obs, active: int | None = None):
        means = []
        for i in range(self.num_primitive):
            h = MLP(self.widths, self.activation)(obs)
            m = nn.Dense(
                self.action_dim,
                kernel_init=nn.initializers.variance_scaling(
                    0.01, "fan_in", "truncated_normal"
                ),
            )(h)
            if active is not None and i < active:
                m = jax.lax.stop_gradient(m)
            means.append(m)
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.log_std_init, jnp.float32),
            (self.action_dim,),
        )
        if self.fixed_std:
            log_std = jax.lax.stop_gradient(log_std)
        if active is None:
            mean = jnp.stack(means, axis=-2)              # (..., N, A)
            return mean, jnp.broadcast_to(log_std, mean.shape)
        mean = means[active]
        return mean, jnp.broadcast_to(log_std, mean.shape)


class AMPDiscriminator(nn.Module):
    """AMP discriminator (the reference's `disc` network block,
    data/cfg/train/rlg/im.yaml:37-41 — units [1024,512] relu; algorithm
    im_amp lives in external rl_games). Returns raw logits; demo
    transitions should score positive, agent transitions negative."""

    widths: Sequence[int] = (1024, 512)
    activation: str = "relu"

    @nn.compact
    def __call__(self, amp_obs):
        h = MLP(self.widths, self.activation)(amp_obs)
        return nn.Dense(
            1,
            kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal"
            ),
        )(h).squeeze(-1)


def amp_disc_loss(
    disc_apply,
    params,
    agent_obs,
    demo_obs,
    logit_reg: float = 0.01,
    grad_penalty: float = 5.0,
):
    """AMP discriminator loss (im.yaml:84-87 coefficients): least-squares
    GAN targets (+1 demo / -1 agent), logit regularization, and an R1-style
    gradient penalty on the demo manifold. Returns (loss, aux dict)."""
    logit_a = disc_apply(params, agent_obs)
    logit_d = disc_apply(params, demo_obs)
    loss_a = jnp.mean(jnp.square(logit_a + 1.0))
    loss_d = jnp.mean(jnp.square(logit_d - 1.0))

    def demo_score(o):
        return disc_apply(params, o).sum()

    g = jax.grad(demo_score)(demo_obs)
    gp = jnp.mean(jnp.sum(jnp.square(g), axis=-1))
    # penalize logit magnitude (disc_logit_reg) via the logits themselves —
    # weight-decay-free JAX equivalent of regularizing the last layer
    reg = jnp.mean(jnp.square(logit_a)) + jnp.mean(jnp.square(logit_d))
    loss = 0.5 * (loss_a + loss_d) + logit_reg * reg + grad_penalty * gp
    acc_demo = jnp.mean((logit_d > 0).astype(jnp.float32))
    acc_agent = jnp.mean((logit_a < 0).astype(jnp.float32))
    return loss, {
        "disc_loss": loss, "grad_penalty": gp,
        "disc_acc_demo": acc_demo, "disc_acc_agent": acc_agent,
    }


def amp_reward(logit, scale: float = 2.0):
    """Style reward from a discriminator logit (rl_games amp_agent
    _calc_disc_rewards: r = -log(max(1 - sigmoid(logit), eps)) *
    disc_reward_scale; scale 2 per im.yaml:87). Demo-like transitions
    (positive logits) earn high reward."""
    prob = jax.nn.sigmoid(logit)
    return -scale * jnp.log(jnp.clip(1.0 - prob, 1e-4, 1.0))


def gaussian_log_prob(mean, log_std, action):
    """Summed diagonal-Gaussian log prob (learning/distributions.py:6-29)."""
    var = jnp.exp(2.0 * log_std)
    lp = -0.5 * (jnp.square(action - mean) / var + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
    return jnp.sum(lp, axis=-1)


def gaussian_kl(mean0, log_std0, mean1, log_std1):
    """KL(p0 || p1) summed over dims (distributions.py kl)."""
    var0, var1 = jnp.exp(2 * log_std0), jnp.exp(2 * log_std1)
    return jnp.sum(
        log_std1 - log_std0 + (var0 + jnp.square(mean0 - mean1)) / (2 * var1) - 0.5,
        axis=-1,
    )


def sample_action(key, mean, log_std):
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)
