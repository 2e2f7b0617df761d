"""iLQR trajectory optimization over the differentiable physics step.

Generic iLQR (backward Riccati pass with Levenberg regularization + forward
line search, fixed iteration counts for jit) over any dynamics function
f(x, u) -> x'. The physics engine is end-to-end differentiable (the
constraint solver unrolls fixed Newton iterations), so A = df/dx and
B = df/du come from jax.jacfwd. No reference counterpart — this is the
BASELINE.md north-star trajectory-optimization deliverable.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    iterations: int = 5
    reg_init: float = 1e-6
    reg_factor: float = 10.0
    reg_max: float = 1e6
    line_search_steps: tuple = (1.0, 0.5, 0.25, 0.1, 0.03)


def ilqr_plan(
    dynamics: Callable,     # f(x (n,), u (m,)) -> x' (n,)
    cost: Callable,         # c(x, u, t) -> scalar
    terminal_cost: Callable,  # cT(x) -> scalar
    x0: jax.Array,          # (n,)
    u_init: jax.Array,      # (T, m)
    config: ILQRConfig | None = None,
):
    """Returns (xs (T+1,n), us (T,m), total_cost)."""
    cfg = config or ILQRConfig()
    T, m = u_init.shape
    n = x0.shape[0]
    dtype = x0.dtype

    def rollout(us):
        def body(x, u):
            x2 = dynamics(x, u)
            return x2, x2
        xT, xs = jax.lax.scan(body, x0, us)
        return jnp.concatenate([x0[None], xs], axis=0)

    def total_cost(xs, us):
        ts = jnp.arange(T)
        cs = jax.vmap(cost)(xs[:-1], us, ts)
        return jnp.sum(cs) + terminal_cost(xs[-1])

    f_x = jax.jacfwd(dynamics, argnums=0)
    f_u = jax.jacfwd(dynamics, argnums=1)
    c_x = jax.grad(cost, argnums=0)
    c_u = jax.grad(cost, argnums=1)
    c_xx = jax.hessian(cost, argnums=0)
    c_uu = jax.hessian(cost, argnums=1)
    c_ux = jax.jacfwd(jax.grad(cost, argnums=1), argnums=0)
    cT_x = jax.grad(terminal_cost)
    cT_xx = jax.hessian(terminal_cost)

    def backward(xs, us, reg):
        """Riccati sweep. Returns (K (T,m,n), k (T,m), ok)."""
        A = jax.vmap(f_x)(xs[:-1], us)       # (T,n,n)
        B = jax.vmap(f_u)(xs[:-1], us)       # (T,n,m)
        ts = jnp.arange(T)
        lx = jax.vmap(c_x)(xs[:-1], us, ts)
        lu = jax.vmap(c_u)(xs[:-1], us, ts)
        lxx = jax.vmap(c_xx)(xs[:-1], us, ts)
        luu = jax.vmap(c_uu)(xs[:-1], us, ts)
        lux = jax.vmap(c_ux)(xs[:-1], us, ts)

        def body(carry, inp):
            Vx, Vxx, ok = carry
            At, Bt, lxt, lut, lxxt, luut, luxt = inp
            Qx = lxt + At.T @ Vx
            Qu = lut + Bt.T @ Vx
            Qxx = lxxt + At.T @ Vxx @ At
            Quu = luut + Bt.T @ Vxx @ Bt
            Qux = luxt + Bt.T @ Vxx @ At
            Quu_reg = Quu + reg * jnp.eye(m, dtype=dtype)
            # solve via cholesky; flag failure through eigvals positivity
            chol = jnp.linalg.cholesky(Quu_reg)
            bad = jnp.any(jnp.isnan(chol))
            chol_safe = jnp.where(bad, jnp.eye(m, dtype=dtype), chol)
            kk = -jax.scipy.linalg.cho_solve((chol_safe, True), Qu)
            KK = -jax.scipy.linalg.cho_solve((chol_safe, True), Qux)
            Vx2 = Qx + KK.T @ Quu @ kk + KK.T @ Qu + Qux.T @ kk
            Vxx2 = Qxx + KK.T @ Quu @ KK + KK.T @ Qux + Qux.T @ KK
            Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
            return (Vx2, Vxx2, ok & ~bad), (KK, kk)

        VxT = cT_x(xs[-1])
        VxxT = cT_xx(xs[-1])
        (_, _, ok), (K, k) = jax.lax.scan(
            body,
            (VxT, VxxT, jnp.asarray(True)),
            (A, B, lx, lu, lxx, luu, lux),
            reverse=True,
        )
        return K, k, ok

    def forward(xs, us, K, k, alpha):
        def body(carry, inp):
            x = carry
            x_ref, u_ref, KK, kk = inp
            u = u_ref + alpha * kk + KK @ (x - x_ref)
            u = jnp.clip(u, -1.0, 1.0)
            x2 = dynamics(x, u)
            return x2, (x2, u)
        _, (xs2, us2) = jax.lax.scan(body, x0, (xs[:-1], us, K, k))
        xs2 = jnp.concatenate([x0[None], xs2], axis=0)
        return xs2, us2

    def iteration(carry, _):
        xs, us, J, reg = carry
        K, k, ok = backward(xs, us, reg)

        def try_alpha(acc, alpha):
            bxs, bus, bJ = acc
            xs2, us2 = forward(xs, us, K, k, alpha)
            J2 = total_cost(xs2, us2)
            better = (J2 < bJ) & jnp.all(jnp.isfinite(J2))
            pick = lambda a, b: jnp.where(better, a, b)
            return (pick(xs2, bxs), jax.tree.map(pick, us2, bus), pick(J2, bJ)), None

        (xs2, us2, J2), _ = jax.lax.scan(
            lambda acc, a: try_alpha(acc, a),
            (xs, us, J),
            jnp.asarray(cfg.line_search_steps, dtype),
        )
        improved = J2 < J
        reg = jnp.where(
            improved, jnp.maximum(reg / cfg.reg_factor, cfg.reg_init),
            jnp.minimum(reg * cfg.reg_factor, cfg.reg_max),
        )
        return (xs2, us2, J2, reg), J2

    xs0 = rollout(u_init)
    J0 = total_cost(xs0, u_init)
    (xs, us, J, _), _ = jax.lax.scan(
        iteration,
        (xs0, u_init, J0, jnp.asarray(cfg.reg_init, dtype)),
        None,
        length=cfg.iterations,
    )
    return xs, us, J
