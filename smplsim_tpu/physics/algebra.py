"""Spatial (6D) vector algebra about a common world origin.

Twists are [omega; v_O] (angular; linear velocity of the body-fixed point
instantaneously at the origin O). Wrenches are [n_O; f] (moment about O;
force). This origin-frame formulation removes all per-joint coordinate
transforms from the dynamics inner loop: every quantity lives in one frame,
so mass-matrix/bias assembly reduces to masked matmuls that map onto the MXU
instead of Featherstone's sequential 6x6 transform chains.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def skew(v: jax.Array) -> jax.Array:
    """(...,3) -> (...,3,3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [o, -z, y, z, o, -x, -y, x, o], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))


def motion_cross(a: jax.Array, b: jax.Array) -> jax.Array:
    """Spatial motion cross product a x b for twists (...,6)."""
    aw, av = a[..., :3], a[..., 3:]
    bw, bv = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, bw), jnp.cross(aw, bv) + jnp.cross(av, bw)], axis=-1
    )


def force_cross(a: jax.Array, b: jax.Array) -> jax.Array:
    """Spatial force cross product a x* b: twist a (...,6), wrench b (...,6)."""
    aw, av = a[..., :3], a[..., 3:]
    bn, bf = b[..., :3], b[..., 3:]
    return jnp.concatenate(
        [jnp.cross(aw, bn) + jnp.cross(av, bf), jnp.cross(aw, bf)], axis=-1
    )


def spatial_inertia(mass: jax.Array, com: jax.Array, inertia_com: jax.Array) -> jax.Array:
    """6x6 spatial inertia about the origin.

    mass (...,), com (...,3) world COM position, inertia_com (...,3,3) world
    rotational inertia about the COM. Layout matches [omega; v_O] twists and
    [n_O; f] wrenches: h = I @ v.
    """
    c = skew(com)
    m = mass[..., None, None]
    top_left = inertia_com + m * (c @ jnp.swapaxes(c, -1, -2))
    top_right = m * c
    bot_left = m * jnp.swapaxes(c, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=mass.dtype), top_left.shape)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
