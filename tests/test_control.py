"""MPC tests: iLQR on an analytic LQR problem + humanoid smoke; CEM
single-device and sharded over the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smplsim_tpu.control import CEMConfig, CEMPlanner, ILQRConfig, ilqr_plan


def test_ilqr_solves_double_integrator():
    """min sum x'Qx + u'Ru for x' = Ax + Bu matches the finite-horizon LQR
    optimum from the discrete Riccati recursion (controls stay in [-1,1])."""
    dt = 0.1
    T = 20
    A = np.array([[1.0, dt], [0.0, 1.0]])
    B = np.array([[0.0], [dt]])
    Q = np.eye(2)
    R = np.eye(1)
    QT = 10.0 * np.eye(2)

    # exact finite-horizon Riccati
    P = QT.copy()
    for _ in range(T):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ A - A.T @ P @ B @ K
    x0 = np.array([1.0, 0.0])
    J_opt = float(x0 @ P @ x0)

    Aj, Bj = jnp.asarray(A), jnp.asarray(B)

    def dyn(x, u):
        return Aj @ x + Bj @ u

    def cost(x, u, t):
        return x @ x + u @ u

    def term(x):
        return 10.0 * (x @ x)

    xs, us, J = ilqr_plan(
        dyn, cost, term, jnp.asarray(x0), jnp.zeros((T, 1)),
        ILQRConfig(iterations=10),
    )
    assert float(J) < J_opt * 1.02 + 1e-6, (float(J), J_opt)
    assert np.max(np.abs(np.asarray(us))) <= 1.0


def test_ilqr_improves_humanoid_cost():
    """iLQR over the real physics step reduces a root-velocity cost."""
    from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig
    from smplsim_tpu.models import registry
    from smplsim_tpu.physics import engine

    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model, SpeedConfig(control_frequency_inv=2))
    nq, nv, nu = model.nq, model.nv, model.nu

    def dyn(x, u):
        st = engine.PhysicsState(qpos=x[:nq], qvel=x[nq:])
        st2, _, _, _ = engine.control_step(model, st, u, control_freq_inv=2)
        return jnp.concatenate([st2.qpos, st2.qvel])

    tar_v = 1.0

    def cost(x, u, t):
        vx = x[nq]
        return (vx - tar_v) ** 2 + 1e-3 * (u @ u)

    def term(x):
        return ((x[nq] - tar_v) ** 2) * 5.0

    st = env.reset(jax.random.PRNGKey(0))
    x0 = jnp.concatenate([st.phys.qpos, st.phys.qvel])
    u0 = jnp.zeros((3, nu), jnp.float32)

    def J_of(us):
        def body(x, u):
            x2 = dyn(x, u)
            return x2, cost(x, u, 0)
        xT, cs = jax.lax.scan(body, x0, us)
        return jnp.sum(cs) + term(xT)

    xs, us, J = jax.jit(
        lambda: ilqr_plan(dyn, cost, term, x0, u0, ILQRConfig(iterations=2))
    )()
    J0 = J_of(u0)
    assert float(J) <= float(J0) + 1e-6
    assert np.isfinite(float(J))


def test_cem_beats_zero_policy():
    from smplsim_tpu.envs import HumanoidGetup, GetupConfig
    from smplsim_tpu.models import registry

    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidGetup(model, GetupConfig(control_frequency_inv=3))
    planner = CEMPlanner(
        env, CEMConfig(horizon=3, num_samples=32, num_elites=4, iterations=2)
    )
    st = env.reset(jax.random.PRNGKey(0))
    plan = jax.jit(lambda k, s: planner.plan(k, s))
    a0, mean, best_cost = plan(jax.random.PRNGKey(1), st)
    zero_cost = planner._rollout_cost(st, jnp.zeros((3, env.action_size)))
    assert float(best_cost) <= float(zero_cost) + 1e-6
    assert a0.shape == (env.action_size,)


def test_cem_sharded_mesh():
    """CEM sampling sharded over 8 CPU devices with global elite selection."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from smplsim_tpu.envs import HumanoidSpeed, SpeedConfig
    from smplsim_tpu.models import registry

    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model, SpeedConfig(control_frequency_inv=2))
    planner = CEMPlanner(
        env, CEMConfig(horizon=2, num_samples=4, num_elites=4, iterations=1)
    )
    st = env.reset(jax.random.PRNGKey(0))
    mesh = Mesh(np.array(jax.devices()[:8]), ("samples",))

    def solve(key, st):
        key = jax.random.fold_in(key, jax.lax.axis_index("samples"))
        return planner.plan(key, st, axis_name="samples")

    sharded = shard_map(
        solve, mesh=mesh,
        in_specs=(P(), jax.tree.map(lambda _: P(), st)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    a0, mean, cost = jax.jit(sharded)(jax.random.PRNGKey(1), st)
    assert a0.shape == (env.action_size,)
    assert np.isfinite(float(cost))
