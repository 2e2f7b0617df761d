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
