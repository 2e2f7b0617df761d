"""In-context cost attribution for the physics substep by ABLATION.

The piece-wise timings in tools/bench_substep.py hold sibling stages fixed,
which lets XLA constant-fold big chunks of the stage under test (e.g. the
delassus row-gather and triangular solve fold away when efc.J is a literal),
under-reporting stage cost.  Here every measurement is the FULL
engine.control_step with one stage replaced by a cheap stand-in; the cost of
the stage is the delta vs the full step.  All variants run the same
serialized-scan harness on the same batch.

    BENCH_B=1024 python tools/ablate_substep.py
"""
import contextlib
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
ITERS = int(os.environ.get("BENCH_ITERS", 10))
SUBSTEPS = int(os.environ.get("BENCH_SUBSTEPS", 15))

results = {}


def timeit(name, fn, n=3):
    out = fn()
    float(np.asarray(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    float(np.asarray(out))
    ms = (time.perf_counter() - t0) / (n * ITERS) * 1e3
    results[name] = ms
    print(f"{name:52s} {ms:9.3f} ms/ctrl-step   ({ms / SUBSTEPS:7.3f} /substep)")
    return ms


@contextlib.contextmanager
def patched(*patches):
    """patches: (module, attr, replacement) triples."""
    olds = [(m, a, getattr(m, a)) for m, a, _ in patches]
    for m, a, r in patches:
        setattr(m, a, r)
    try:
        yield
    finally:
        for m, a, o in olds:
            setattr(m, a, o)


def main():
    from smplsim_tpu.envs import HumanoidSpeed
    from smplsim_tpu.models import registry
    from smplsim_tpu.physics import (collision_pairs, constraints, control,
                                     dynamics, dynamics_lanes, engine, solver,
                                     substep_lanes)

    model = registry.default_humanoid(dtype=jnp.float32)
    env = HumanoidSpeed(model)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.jit(jax.vmap(env.reset))(keys)
    vstep = jax.jit(jax.vmap(env.step_autoreset))
    for i in range(5):
        a = jax.random.uniform(jax.random.PRNGKey(i), (B, env.action_size),
                               jnp.float32, minval=-1, maxval=1)
        states = vstep(states, a)
    qpos = states.phys.qpos
    qvel = states.phys.qvel
    act = jax.random.uniform(jax.random.PRNGKey(99), (B, model.nu),
                             jnp.float32, minval=-1, maxval=1)

    def make_ctrl_scan():
        def scan_fn(qpos0):
            def body(carry, _):
                eps, q = carry
                st = jax.vmap(
                    lambda qq, v, a: engine.control_step(
                        model, engine.PhysicsState(qq + eps, v), a,
                        control_freq_inv=SUBSTEPS)[0]
                )(q, qvel, act)
                return (jnp.sum(st.qpos) * 1e-30, q), None
            (s, _), _ = jax.lax.scan(
                body, (jnp.float32(0), qpos0), None, length=ITERS)
            return s
        return jax.jit(scan_fn)

    def run(name, *patches):
        with patched(*patches):
            fn = make_ctrl_scan()
            return timeit(name, lambda: fn(qpos))

    # ---------------- stand-ins ----------------
    def no_self_contacts(model_, kin_):
        Z = collision_pairs.MAX_SELF
        dtype = kin_.xpos.dtype
        return collision_pairs.SelfContacts(
            dist=jnp.full(Z, 1e9, dtype), pos=jnp.zeros((Z, 3), dtype),
            normal=jnp.zeros((Z, 3), dtype).at[:, 2].set(1.0),
            body1=jnp.zeros(Z, jnp.int32), body2=jnp.zeros(Z, jnp.int32),
            friction=jnp.ones(Z, dtype), margin=jnp.zeros(Z, dtype),
            active=jnp.zeros(Z, bool),
        )

    real_make_efc = constraints.make_efc

    def no_efc(model_, kin_, qpos_, qvel_):
        e = real_make_efc(model_, kin_, qpos_, qvel_)
        return e._replace(active=jnp.zeros_like(e.active))

    def cheap_efc(model_, kin_, qpos_, qvel_):
        """Fixed trivial EFC (skips assembly almost entirely)."""
        nv = model_.nv
        nefc = constraints.NEFC
        dtype = qpos_.dtype
        C = constraints.MAX_CONTACTS
        CT = C + constraints.MAX_SELF
        L = constraints.MAX_LIMITS
        return constraints.EFC(
            l_J=jnp.zeros((L, nv), dtype) + qpos_[0] * 1e-30,
            l_aref=jnp.zeros(L, dtype),
            l_R=jnp.ones(L, dtype),
            W6=jnp.zeros((CT, 4, 6), dtype),
            body1=jnp.full(CT, -1, jnp.int32),
            body2=jnp.full(CT, -1, jnp.int32),
            aref=jnp.zeros((CT, 4), dtype),
            R=jnp.ones((CT, 4), dtype),
            active=jnp.zeros(nefc, bool),
            con_dist=jnp.full(C, 1e9, dtype),
            con_geom=jnp.zeros(C, jnp.int32),
            con_pos=jnp.zeros((C, 3), dtype),
            con_active=jnp.zeros(C, bool),
            geom_floor_contact=jnp.zeros(model_.ngeom, bool),
        )

    def no_solve(model_, kin_, smooth_, efc_, f_warm=None):
        nefc = efc_.active.shape[0]
        nv = smooth_.qacc_smooth.shape[0]
        z = jnp.zeros(nefc, smooth_.qacc_smooth.dtype)
        return solver.ConstraintSolution(
            qacc=smooth_.qacc_smooth, efc_force=z,
            qfrc_constraint=jnp.zeros(nv, smooth_.qacc_smooth.dtype),
            nactive=jnp.zeros((), jnp.int32),
            overflow=jnp.zeros((), bool), stalled=jnp.zeros((), bool),
        )

    real_solve = solver.solve_constraints

    def solve_no_qp(model_, kin_, smooth_, efc_, f_warm=None):
        """Everything in solve_constraints except the Newton QP kernel."""
        from smplsim_tpu.ops import qp_kernel as qk
        with patched((qk, "newton_qp",
                      lambda A, b, active, f0=None: jnp.maximum(b, 0.0) * active)):
            return real_solve(model_, kin_, smooth_, efc_, f_warm)

    def simple_pd(model_, M, C, qpos_, qvel_, target, kp_scale=1.0, kd_scale=1.0):
        """PD without the (M+dtKd) cholesky solve."""
        err = qpos_[7:] - target
        tau = -model_.jkp * err - model_.jkd * qvel_[6:]
        return jnp.clip(tau, -model_.torque_lim, model_.torque_lim)

    # ---- floor-level knockouts (r5): attribute the trivial-everything
    # floor between FK, CRBA assembly, bias, and the dense linalg chain ----
    from smplsim_tpu.physics import linalg

    def diag_mass(model_, kin_):
        nv = model_.nv
        d = model_.armature + 10.0 + kin_.xpos[0, 0] * 1e-30
        return jnp.zeros((nv, nv), d.dtype) + jnp.diag(d)

    def no_bias(model_, kin_, qvel_):
        return qvel_ * 1e-30

    def diag_factor_solve(A, b):
        d = jnp.diagonal(A, axis1=-2, axis2=-1)
        eye = jnp.zeros_like(A) + jnp.eye(A.shape[-1], dtype=A.dtype)
        return eye * (1.0 + d[..., None, :] * 1e-30), b / d

    def no_tri(L, b):
        return b * (1.0 + L[..., 0:1, 0:1] * 1e-30)

    def no_chosolve(L, b):
        return b * (1.0 + L[..., 0, 0] * 1e-30)

    # family knockouts: drop one pair family entirely from self-collision
    real_pair_lists = collision_pairs._pair_lists

    def drop_family(*fams):
        def pl(*args):
            d = dict(real_pair_lists(*args))
            for f in fams:
                d[f] = d[f][:0]
            return d
        return pl

    # ---- lanes-spine stand-ins (r5: the batched path runs substep_lanes;
    # per-env patches only affect the reference path, so knockouts target
    # the spine's seams) ----
    real_solve_lanes = substep_lanes.solve_constraints_lanes
    real_qp_dispatch = substep_lanes._qp_dispatch
    real_chol_dispatch = substep_lanes._chol_solve_dispatch

    def no_solve_lanes(model_, S, Msolve, qfrc, efc, f_w, iters, K):
        nv = S.shape[0]
        B = S.shape[-1]
        if callable(Msolve):                 # r5 ABA path passes a closure
            x = Msolve(qfrc[:, None, :])[:, 0, :]
        else:
            # dynamic lookup so the diag-chol knockout composes in skeleton
            np_ = Msolve.shape[0]
            rhs = jnp.zeros((np_, 1, B), qfrc.dtype).at[:nv, 0, :].set(qfrc)
            x = substep_lanes._chol_solve_dispatch(Msolve, rhs)[:nv, 0, :]
        z = jnp.zeros_like(f_w)
        return (x, z, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool),
                jnp.zeros((B,), bool), x)

    def qp_off(At, bt, at, ft, iters):
        return jnp.maximum(bt, 0.0) * at

    def simple_pd_lanes(model_, Msolve, C_prev, qT, vT, targetT):
        dtype = C_prev.dtype
        B = C_prev.shape[-1]
        jkp = jnp.broadcast_to(
            model_.jkp[..., None] if model_.jkp.ndim == 1 else model_.jkp,
            (targetT.shape[0], B))
        jkd = jnp.broadcast_to(
            model_.jkd[..., None] if model_.jkd.ndim == 1 else model_.jkd,
            (targetT.shape[0], B))
        lim = jnp.broadcast_to(
            model_.torque_lim[..., None] if model_.torque_lim.ndim == 1
            else model_.torque_lim, (targetT.shape[0], B))
        err = qT[7:] - targetT
        tau = -jkp * err - jkd * vT[6:] + C_prev[6:] * 1e-30
        return jnp.clip(tau, -lim, lim)

    def diag_chol_dispatch(Mt, bt, diag_t=None):
        d = Mt[jnp.arange(Mt.shape[0]), jnp.arange(Mt.shape[0]), :]
        if diag_t is not None:
            d = d + diag_t
        return bt / d[:, None, :]

    def diag_mass_lanes(S, com, inertia_w, body_mass, armature, masks):
        nv, _, B = S.shape
        d = (jnp.broadcast_to(
            armature[..., None] if armature.ndim == 1 else armature, (nv, B))
            + 10.0 + S[0, 0] * 1e-30)
        eye = jnp.eye(nv, dtype=S.dtype)[:, :, None]
        return eye * d[None, :, :]

    def no_bias_lanes(S, com, inertia_w, body_mass, gravity, qvel, masks):
        return qvel * 1e-30

    # ---------------- measurements ----------------
    full = run("full control_step")
    if os.environ.get("BENCH_FAMILIES"):
        run("  - cc family off", (collision_pairs, "_pair_lists", drop_family("cc")))
        run("  - cb family off", (collision_pairs, "_pair_lists", drop_family("cb")))
        run("  - bb family off", (collision_pairs, "_pair_lists", drop_family("bb")))
    run("  - self contacts off", (collision_pairs, "self_contacts", no_self_contacts),
        (constraints, "self_contacts", no_self_contacts))
    run("  - EFC all-inactive (assembly still runs)",
        (constraints, "make_efc", no_efc))
    run("  - EFC trivial (no assembly)", (constraints, "make_efc", cheap_efc))
    run("  - no constraint solve (qacc=smooth)",
        (substep_lanes, "solve_constraints_lanes", no_solve_lanes),
        (solver, "solve_constraints", no_solve),
        (engine.solver, "solve_constraints", no_solve))
    run("  - solve w/o newton QP kernel",
        (substep_lanes, "_qp_dispatch", qp_off))
    run("  - simple PD (no stable-PD chol)",
        (substep_lanes, "stable_pd_lanes", simple_pd_lanes),
        (control, "stable_pd_torque", simple_pd))
    run("  - trivial EFC + no solve",
        (constraints, "make_efc", cheap_efc),
        (substep_lanes, "solve_constraints_lanes", no_solve_lanes),
        (solver, "solve_constraints", no_solve),
        (engine.solver, "solve_constraints", no_solve))
    run("  - trivial EFC + no solve + simple PD",
        (constraints, "make_efc", cheap_efc),
        (substep_lanes, "solve_constraints_lanes", no_solve_lanes),
        (substep_lanes, "stable_pd_lanes", simple_pd_lanes),
        (solver, "solve_constraints", no_solve),
        (engine.solver, "solve_constraints", no_solve),
        (control, "stable_pd_torque", simple_pd))
    if os.environ.get("BENCH_FLOOR"):
        run("  - mass matrix = diag (no CRBA assembly)",
            (dynamics_lanes, "mass_matrix_lanes", diag_mass_lanes),
            (dynamics, "mass_matrix", diag_mass))
        run("  - no bias forces (no RNEA)",
            (dynamics_lanes, "bias_forces_lanes", no_bias_lanes),
            (dynamics, "bias_forces", no_bias))
        run("  - all chol solves = diag (no 75x75 factor)",
            (substep_lanes, "_chol_solve_dispatch", diag_chol_dispatch),
            (linalg, "cho_factor_solve", diag_factor_solve))
        run("  - skeleton (trivial EFC/solve/PD + diag M + no bias)",
            (constraints, "make_efc", cheap_efc),
            (substep_lanes, "solve_constraints_lanes", no_solve_lanes),
            (substep_lanes, "stable_pd_lanes", simple_pd_lanes),
            (substep_lanes, "_chol_solve_dispatch", diag_chol_dispatch),
            (dynamics_lanes, "mass_matrix_lanes", diag_mass_lanes),
            (dynamics_lanes, "bias_forces_lanes", no_bias_lanes),
            (solver, "solve_constraints", no_solve),
            (engine.solver, "solve_constraints", no_solve),
            (control, "stable_pd_torque", simple_pd),
            (dynamics, "mass_matrix", diag_mass),
            (dynamics, "bias_forces", no_bias),
            (linalg, "cho_factor_solve", diag_factor_solve))

    print()
    print(f"batch={B}  substeps={SUBSTEPS}  platform={jax.default_backend()}")
    print(f"implied env-steps/s (full): {B / (full / 1e3):,.0f}")

    out = os.environ.get("BENCH_JSON")
    if out:
        import json
        with open(out, "w") as f:
            json.dump({"batch": B, "iters": ITERS,
                       "platform": jax.default_backend(),
                       "qp_iters": int(os.environ.get("SMPLSIM_QP_ITERS", 40)),
                       "qp_rows": int(os.environ.get("SMPLSIM_QP_ROWS", 64)),
                       "ms_per_ctrl_step": {k: round(v, 4) for k, v in results.items()}},
                      f, indent=1)
            f.write("\n")
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
