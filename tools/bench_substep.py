"""Per-block substep breakdown on real TPU hardware.

Times each stage of the physics substep (fk / smooth dynamics / contact
assembly pieces / constraint solve pieces) plus the full substep, control
step, and env step, with honest sustained timing: each measurement is a
lax.scan of ITERS serialized iterations inside ONE jit (fixed per-program
dispatch overhead amortized away), synced by a host read of a scalar slice
(block_until_ready under-reports through the axon tunnel).

    python tools/bench_substep.py            # B=1024 by default
    BENCH_B=4096 python tools/bench_substep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

B = int(os.environ.get("BENCH_B", 1024))
ITERS = int(os.environ.get("BENCH_ITERS", 30))

results = {}


SECTIONS = os.environ.get("BENCH_SECTIONS", "").split(",") if os.environ.get("BENCH_SECTIONS") else None


def timeit(name, make_scan, n=3):
    """make_scan() -> jitted fn returning a scalar; time ITERS-iteration scans."""
    if SECTIONS is not None and not any(sec and sec in name for sec in SECTIONS):
        return None
    fn = make_scan()
    out = fn()
    float(np.asarray(out))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(np.asarray(out))
    ms = (time.perf_counter() - t0) / (n * ITERS) * 1e3
    results[name] = ms
    print(f"{name:44s} {ms:8.3f} ms/iter")
    return ms


def main():
    from smplsim_tpu.envs import HumanoidSpeed
    from smplsim_tpu.models import registry
    from smplsim_tpu.physics import constraints, dynamics, engine, kinematics, solver
    from smplsim_tpu.physics import collision_pairs, linalg

    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(env.reset))(keys)
    # scatter the batch into varied (contact-rich-ish) poses: a few random
    # control steps from default init
    vstep = jax.jit(jax.vmap(env.step_autoreset))
    for i in range(5):
        a = jax.random.uniform(jax.random.PRNGKey(i), (B, env.action_size),
                               jnp.float32, minval=-1, maxval=1)
        states = vstep(states, a)
    qpos = states.phys.qpos
    qvel = states.phys.qvel
    ctrl = jax.random.uniform(jax.random.PRNGKey(99), (B, model.nu),
                              jnp.float32, minval=-20, maxval=20)

    kin = jax.jit(jax.vmap(lambda q: kinematics.fk(model, q)))(qpos)
    smooth = jax.jit(jax.vmap(lambda k, v, c: dynamics.smooth_dynamics(model, k, v, c)))(
        kin, qvel, ctrl)
    efc = jax.jit(jax.vmap(lambda k, q, v: constraints.make_efc(model, k, q, v)))(
        kin, qpos, qvel)

    def serialized(fn, x0, out_scalar):
        """Build a jitted ITERS-scan where each iter depends on the last."""
        def scan_fn():
            def body(carry, _):
                eps, x = carry
                out = fn(jax.tree.map(lambda a: a, x), eps)
                s = out_scalar(out)
                return (s * 1e-30, x), None
            (s, _), _ = jax.lax.scan(body, (jnp.float32(0), x0), None, length=ITERS)
            return s
        return jax.jit(scan_fn)

    # ---- fk
    timeit("fk", lambda: serialized(
        lambda x, eps: jax.vmap(lambda q: kinematics.fk(model, q))(x + eps),
        qpos, lambda k: k.xpos.sum()))

    # ---- smooth dynamics (given kin)
    timeit("smooth_dynamics (CRBA+RNEA+chol75+solve)", lambda: serialized(
        lambda x, eps: jax.vmap(
            lambda k, v, c: dynamics.smooth_dynamics(model, k, v, c)
        )(kin, x + eps, ctrl),
        qvel, lambda s: s.qacc_smooth.sum()))

    # ---- make_efc pieces
    timeit("make_efc (total)", lambda: serialized(
        lambda x, eps: jax.vmap(
            lambda k, q, v: constraints.make_efc(model, k, q, v)
        )(kin, x + eps, qvel),
        qpos, lambda e: e.W6.sum()))

    timeit("  floor_contacts (candidates)", lambda: serialized(
        lambda x, eps: jax.vmap(
            lambda k: constraints.floor_contacts(
                model,
                k._replace(xpos=k.xpos + eps),
            )
        )(kin),
        qpos, lambda out: out[0].sum()))

    timeit("  self_contacts (narrowphase)", lambda: serialized(
        lambda x, eps: jax.vmap(
            lambda k: collision_pairs.self_contacts(
                model, k._replace(xpos=k.xpos + eps)
            )
        )(kin),
        qpos, lambda sc: sc.dist.sum()))

    # ---- make_efc ablations: cost attribution by knocking out pieces
    import contextlib

    @contextlib.contextmanager
    def patched(obj, name, repl):
        orig = getattr(obj, name)
        setattr(obj, name, repl)
        try:
            yield
        finally:
            setattr(obj, name, orig)

    def fake_self_contacts(model_, kin_):
        dtype = kin_.xpos.dtype
        Z = collision_pairs.MAX_SELF
        return collision_pairs.SelfContacts(
            dist=jnp.full(Z, 1e9, dtype), pos=jnp.zeros((Z, 3), dtype),
            normal=jnp.zeros((Z, 3), dtype).at[:, 2].set(1.0),
            body1=jnp.zeros(Z, jnp.int32), body2=jnp.zeros(Z, jnp.int32),
            friction=jnp.ones(Z, dtype), margin=jnp.zeros(Z, dtype),
            active=jnp.zeros(Z, bool),
        )

    with patched(constraints, "self_contacts", fake_self_contacts):
        timeit("  make_efc w/o self (ablation)", lambda: serialized(
            lambda x, eps: jax.vmap(
                lambda k, q, v: constraints.make_efc(model, k, q, v)
            )(kin, x + eps, qvel),
            qpos, lambda e: e.W6.sum()))

    # ---- solver pieces
    def e_perturb(e, eps):
        return e._replace(aref=e.aref + eps)

    timeit("solve_constraints (total)", lambda: serialized(
        lambda x, eps: jax.vmap(
            lambda k, s, e: solver.solve_constraints(model, k, s, e)
        )(kin, smooth, e_perturb(efc, eps)),
        qpos, lambda s: s.qacc.sum()))

    # Delassus + QP inputs via the real solver internals (EFC v2 row specs)
    def delassus(k, s, e):
        from smplsim_tpu.physics.constraints import top_k_onehot
        from smplsim_tpu.physics.topology import tree_masks
        dtype = e.l_J.dtype
        nefc = e.active.shape[0]
        K = min(solver.COMPACT_ROWS, nefc)
        L = e.l_J.shape[0]
        _, onehot = top_k_onehot(e.active.astype(dtype), K)
        act = (onehot @ e.active.astype(dtype)) > 0.5
        aref_all = jnp.concatenate([e.l_aref, e.aref.reshape(-1)])
        R_all = jnp.concatenate([e.l_R, e.R.reshape(-1)])
        oh_con = onehot[:, L:]
        W6_c = oh_con @ e.W6.reshape(-1, 6)
        b1_c = oh_con @ jnp.repeat(e.body1, 4).astype(dtype)
        b2_c = oh_con @ jnp.repeat(e.body2, 4).astype(dtype)
        body_dof = jnp.asarray(tree_masks(model.parents)["body_dof"], dtype)
        ar = jnp.arange(body_dof.shape[0], dtype=dtype)[None]
        b1o = ((jnp.abs(b1_c[:, None] - ar) < 0.5) & (b1_c[:, None] > -0.5)).astype(dtype)
        b2o = ((jnp.abs(b2_c[:, None] - ar) < 0.5) & (b2_c[:, None] > -0.5)).astype(dtype)
        J_c = (W6_c @ k.S.T) * ((b2o - b1o) @ body_dof) + onehot[:, :L] @ e.l_J
        J_c = J_c * act[:, None]
        Y = linalg.tri_solve_lower(s.chol, J_c.T)
        A = Y.T @ Y + jnp.diag(onehot @ R_all)
        b = (onehot @ aref_all) - J_c @ s.qacc_smooth
        return A, jnp.where(act, b, 0.0), act

    timeit("  delassus assembly (J build + tri-solve)", lambda: serialized(
        lambda x, eps: jax.vmap(delassus)(kin, smooth, e_perturb(efc, eps)),
        qpos, lambda ab: ab[0].sum()))

    Ab, bb_, actb = jax.jit(jax.vmap(delassus))(kin, smooth, efc)
    from smplsim_tpu.ops import qp_kernel
    f0_cold = jnp.zeros_like(bb_)
    timeit("  newton_qp kernel cold", lambda: serialized(
        lambda x, eps: qp_kernel._newton_qp_pallas(Ab, bb_ + eps, actb, f0_cold),
        qpos, lambda f: f.sum()))
    f_sol = jax.jit(qp_kernel._newton_qp_pallas)(Ab, bb_, actb, f0_cold)
    timeit("  newton_qp kernel warm (f0=solution)", lambda: serialized(
        lambda x, eps: qp_kernel._newton_qp_pallas(Ab, bb_ + eps, actb, f_sol),
        qpos, lambda f: f.sum()))

    # ---- full substep / control step / env step
    timeit("engine.step (1 substep)", lambda: serialized(
        lambda x, eps: jax.vmap(
            lambda q, v, c: engine.step(
                model, engine.PhysicsState(q, v), c)
        )(x + eps, qvel, ctrl),
        qpos, lambda si: si[0].qpos.sum()))

    def ctrl_step(x, eps):
        st = jax.vmap(
            lambda q, v, a: engine.control_step(model, engine.PhysicsState(q + eps, v), a)[0]
        )(x, qvel, jnp.tanh(ctrl / 20))
        return st

    timeit("engine.control_step (15 substeps)", lambda: serialized(
        ctrl_step, qpos, lambda st: st.qpos.sum()))

    timeit("env.step (no autoreset)", lambda: serialized(
        lambda x, eps: jax.vmap(env.step)(
            x.replace(phys=x.phys.replace(qpos=x.phys.qpos + eps)),
            jnp.tanh(ctrl / 20)),
        states, lambda st: st.phys.qpos.sum()))

    timeit("env.step_autoreset (full)", lambda: serialized(
        lambda x, eps: jax.vmap(env.step_autoreset)(
            x.replace(phys=x.phys.replace(qpos=x.phys.qpos + eps)),
            jnp.tanh(ctrl / 20)),
        states, lambda st: st.phys.qpos.sum()))

    print()
    cs = results.get("engine.control_step (15 substeps)")
    if cs:
        print(f"implied env-steps/s at B={B}: {B / (cs / 1e3):,.0f}")

    out = os.environ.get("BENCH_JSON")
    if out:
        import json

        payload = {
            "batch": B, "iters": ITERS,
            "platform": jax.default_backend(),
            "qp_iters": int(os.environ.get("SMPLSIM_QP_ITERS", 40)),
            "ms_per_iter": {k: round(v, 4) for k, v in results.items()},
        }
        if cs:
            payload["implied_env_steps_per_s"] = round(B / (cs / 1e3), 1)
        with open(out, "w") as f:
            json.dump(payload, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
