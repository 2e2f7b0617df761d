"""Generalized advantage estimation as a reverse lax.scan.

Same recursion as the reference's sequential python loop
(learning/learning_utils.py:200-220): deltas and advantages propagate through
time with `not_done` masking episode boundaries and `not_dead` masking true
terminations (bootstrapping continues through truncations).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_advantages(
    rewards: jax.Array,     # (T, B)
    values: jax.Array,      # (T, B) V(s_t)
    last_value: jax.Array,  # (B,) V(s_T)
    not_done: jax.Array,    # (T, B) 0 where episode ended at t (term or trunc)
    not_dead: jax.Array,    # (T, B) 0 where true termination (no bootstrap)
    gamma: float = 0.99,
    tau: float = 0.95,
):
    """Returns (advantages, returns), both (T, B)."""

    def rev(carry, xs):
        adv_next, v_next = carry
        r, v, nd, na = xs
        delta = r + gamma * v_next * na - v
        adv = delta + gamma * tau * nd * adv_next
        return (adv, v), adv

    (_, _), advs = jax.lax.scan(
        rev,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, not_done, not_dead),
        reverse=True,
    )
    returns = advs + values
    return advs, returns
