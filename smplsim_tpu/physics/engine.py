"""The full physics step: the TPU-native mujoco.mj_step equivalent.

Single-env, pure-functional; batch via vmap, time via lax.scan. One substep =
FK -> smooth dynamics -> constraint assembly -> dual solve -> Euler integrate
(mirrors the per-substep loop the reference runs through MuJoCo at 450 Hz,
smpl_sim/envs/humanoid_env.py:439-453).

The uhc_pd control loop is a custom_vmap op: per-env calls (and all
differentiation) run the reference substep composition below; under an env
vmap the WHOLE 15-substep loop runs the lanes-last spine in
physics/substep_lanes.py (r5 — the per-op custom_vmap seams were shipping
the (75,75,B) mass matrix between layouts every substep, 45% of the step).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from smplsim_tpu.models.spec import RobotModel
from smplsim_tpu.physics import linalg
from smplsim_tpu.physics import constraints, dynamics, integrator, kinematics, solver


class PhysicsState(struct.PyTreeNode):
    qpos: jax.Array
    qvel: jax.Array


class LeanInfo(NamedTuple):
    """What the env layer consumes from a control step — deliberately lean so
    the batched path never materializes per-substep (nefc, nv) state."""

    geom_floor_contact: jax.Array  # (ngeom,) any floor candidate in margin
    nactive_max: jax.Array         # () int32 max active EFC rows (substeps)
    stalled_any: jax.Array         # () bool any substep's QP under-converged


class StepInfo(NamedTuple):
    kin: kinematics.Kin
    smooth: dynamics.Smooth
    efc: constraints.EFC
    sol: solver.ConstraintSolution
    # max active EFC rows over the substeps this info summarizes (== the
    # single substep's count for engine.step). If this reaches
    # solver.COMPACT_ROWS the compact solve truncated rows and forces are
    # approximate — see tests/test_getup_parity.py for the regime check.
    nactive_max: jax.Array | None = None
    # any substep's QP returned forces short of the KKT tolerance
    # (iteration cap / movement-floor exit) — solver health telemetry
    stalled_any: jax.Array | None = None


def init_state(model: RobotModel) -> PhysicsState:
    return PhysicsState(qpos=model.qpos0, qvel=jnp.zeros(model.nv, model.qpos0.dtype))


# mjMAXVAL: MuJoCo aborts-and-resets when |qpos/qvel/qacc| exceeds this
# (mj_checkPos/Vel/Acc in mj_step -> mj_resetData). We replicate the reset so
# pathological states (violent random actions, f32 rounding) recover instead
# of propagating NaN through the batch.
MJ_MAXVAL = 1e10


def _state_bad(qpos: jax.Array, qvel: jax.Array, qacc: jax.Array) -> jax.Array:
    def bad(x):
        return jnp.any(~jnp.isfinite(x)) | jnp.any(jnp.abs(x) > MJ_MAXVAL)

    return bad(qpos) | bad(qvel) | bad(qacc)


def forward(
    model: RobotModel, state: PhysicsState, ctrl: jax.Array, f_warm=None
) -> StepInfo:
    """Compute accelerations + constraint forces at the current state."""
    kin = kinematics.fk(model, state.qpos)
    smooth = dynamics.smooth_dynamics(model, kin, state.qvel, ctrl)
    efc = constraints.make_efc(model, kin, state.qpos, state.qvel)
    sol = solver.solve_constraints(model, kin, smooth, efc, f_warm)
    return StepInfo(kin=kin, smooth=smooth, efc=efc, sol=sol)


def step(model: RobotModel, state: PhysicsState, ctrl: jax.Array):
    """One physics substep (mj_step equivalent). Returns (state', StepInfo)."""
    info = forward(model, state, ctrl)
    info = info._replace(nactive_max=info.sol.nactive,
                         stalled_any=info.sol.stalled)
    qpos, qvel = integrator.euler_step(
        model, state.qpos, state.qvel, info.sol.qacc, model.timestep
    )
    return PhysicsState(qpos=qpos, qvel=qvel), info


def _forward_smooth(model: RobotModel, state: PhysicsState, tau: jax.Array,
                    ext_force=None):
    """FK + smooth dynamics under actuation tau. Returns (kin, smooth, efc, M, C)."""
    kin = kinematics.fk(model, state.qpos)
    M = dynamics.mass_matrix(model, kin)
    C = dynamics.bias_forces(model, kin, state.qvel)
    qfrc = (
        dynamics.actuator_forces(model, tau)
        + dynamics.passive_forces(model, state.qvel)
        - C
    )
    if ext_force is not None:
        qfrc = qfrc + dynamics.external_forces(model, kin, ext_force)
    chol, qacc_smooth = linalg.cho_factor_solve(M, qfrc)
    smooth = dynamics.Smooth(M=M, chol=chol, qfrc_smooth=qfrc, qacc_smooth=qacc_smooth)
    efc = constraints.make_efc(model, kin, state.qpos, state.qvel)
    return kin, smooth, efc, M, C


def pd_cache(model: RobotModel, state: PhysicsState):
    """(M, C) at the current state — the mj_forward-at-reset equivalent."""
    kin = kinematics.fk(model, state.qpos)
    M = dynamics.mass_matrix(model, kin)
    C = dynamics.bias_forces(model, kin, state.qvel)
    return (M, C)


def reset_reference(model: RobotModel):
    """(qpos0, qvel0, M, C) at the reset pose — the mjWARN_BADQACC recovery
    target. Compute ONCE per model (host/init time) and pass to control_step
    as `reset_ref` so the hot loop doesn't re-run a constant FK+CRBA+RNEA."""
    st = init_state(model)
    M, C = pd_cache(model, st)
    return (st.qpos, st.qvel, M, C)


def control_step(
    model: RobotModel,
    state: PhysicsState,
    action: jax.Array,
    control_freq_inv: int = 15,
    control_mode: str = "uhc_pd",
    power_scale: float = 1.0,
    cache=None,
    pd_target_mask=None,
    reset_ref=None,
    ext_force=None,
    proj=None,
):
    """One control step = control_freq_inv substeps, torque recomputed per
    substep (reference physics_step, humanoid_env.py:439-453).

    Stable-PD reads mjData.qM/qfrc_bias at call time; after an mj_step those
    are the PREVIOUS substep's pre-integration values. The scan carries (M,C)
    with exactly that lifecycle. Pass `cache` (from a previous control_step or
    pd_cache()) to continue an episode's MjData lifecycle exactly; None primes
    with a fresh forward pass (the reference's mj_forward at reset). The
    returned cache is (M, C, efc_force) — the trailing entry warm-starts the
    next control step's first constraint solve; a 2-tuple (M, C) is accepted
    on input (cold start).

    `reset_ref` is reset_reference(model), precomputed; None recomputes it
    inline (constant-folded under jit when `model` is a closure constant,
    recomputed per call when model is traced).

    `ext_force` (nbody, 3): optional world-frame external force applied at
    each body's COM during every substep of this control step — the
    impulse-perturbation / projectile fault-injection hook (reference
    nv/humanoid.py:80-190).

    Returns (state', last StepInfo, power, cache').
    """
    from smplsim_tpu.physics import constraints as con_mod
    from smplsim_tpu.physics import control as ctrl_mod

    dtype = state.qpos.dtype
    nefc = con_mod.NEFC
    if reset_ref is None:
        reset_ref = reset_reference(model)
    reset_qpos, reset_qvel, M_reset, C_reset = reset_ref

    if control_mode == "uhc_pd":
        target = ctrl_mod.pd_target_from_action(model, action)
        if pd_target_mask is not None:
            # freeze_hand/toe/neck zero the PD target of masked joints
            # (reference pre_physics_step, nv/humanoid.py:2042-2073)
            target = target * pd_target_mask
        if cache is None:
            cache = pd_cache(model, state)
        if len(cache) == 2:
            M0, C0 = cache
            f_w0 = jnp.zeros(nefc, dtype)
        else:
            M0, C0, f_w0 = cache

        op = _uhc_op_for(control_freq_inv, ext_force is not None,
                         proj is not None)
        args = (model, state.qpos, state.qvel, M0, C0, f_w0, target,
                reset_qpos, reset_qvel, M_reset, C_reset)
        if ext_force is not None:
            args = args + (ext_force,)
        if proj is not None:
            args = args + tuple(proj)
        outs = op(*args)
        (qpos, qvel, M_last, C_last, f_w, power, nact, stall, gfc) = outs[:9]
        ret = (
            PhysicsState(qpos=qpos, qvel=qvel),
            LeanInfo(geom_floor_contact=gfc, nactive_max=nact,
                     stalled_any=stall),
            power,
            (M_last, C_last, f_w),
        )
        if proj is not None:
            # 5-tuple for projectile callers: updated (pos, vel)
            return ret + ((outs[9], outs[10]),)
        return ret

    def substep(carry, _):
        st, f_w, power, nact, stall = carry
        if control_mode == "torque":
            tau = ctrl_mod.torque_ctrl(model, action, power_scale)
        elif control_mode == "default":
            tau = action
        else:
            raise NotImplementedError(control_mode)
        info = forward(model, st, tau, f_warm=f_w)
        qpos, qvel = integrator.euler_step(
            model, st.qpos, st.qvel, info.sol.qacc, model.timestep
        )
        st2 = PhysicsState(qpos=qpos, qvel=qvel)
        bad = _state_bad(st.qpos, st.qvel, info.sol.qacc)
        st2 = PhysicsState(
            qpos=jnp.where(bad, reset_qpos, st2.qpos),
            qvel=jnp.where(bad, reset_qvel, st2.qvel),
        )
        f_w = jnp.where(bad, 0.0, info.sol.efc_force)
        power = power + jnp.where(bad, 0.0, jnp.sum(jnp.abs(tau * st.qvel[6:])))
        nact = jnp.maximum(nact, info.sol.nactive)
        stall = stall | info.sol.stalled
        return (st2, f_w, power, nact, stall), info._replace(
            nactive_max=nact, stalled_any=stall
        )

    carry = (
        state, jnp.zeros(nefc, dtype), jnp.zeros((), dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), bool),
    )
    if control_freq_inv > 1:
        def substep_noinfo(carry, _):
            return substep(carry, None)[0], None

        carry, _ = jax.lax.scan(
            substep_noinfo, carry, None, length=control_freq_inv - 1
        )
    (state, _, power, _, _), last_info = substep(carry, None)
    lean = LeanInfo(
        geom_floor_contact=last_info.efc.geom_floor_contact,
        nactive_max=last_info.nactive_max,
        stalled_any=last_info.stalled_any,
    )
    return state, lean, power, None


# ---------------------------------------------------------------------------
# the uhc_pd control-loop op: reference per-env composition + lanes batch twin
# ---------------------------------------------------------------------------
def _uhc_core_ref(model, qpos, qvel, M0, C0, f_w0, target,
                  reset_qpos, reset_qvel, M_reset, C_reset, ext_force,
                  proj, *, control_freq_inv: int):
    """Per-env reference uhc_pd loop (the pre-r5 control_step body), lean
    outputs only. This is the parity oracle and the differentiation path.

    `proj` optionally carries free projectile spheres
    (pos (P,3), vel (P,3), radius (P,), invmass (P,)): integrated
    ballistically per substep, coupled to the humanoid through the EFC
    pyramid rows (constraints.make_efc spheres=...) with the solved contact
    force applied equal-and-opposite to each sphere, and an inelastic floor
    clamp (the TPU-native simulated version of the reference's thrown
    projectile assets, nv/humanoid.py:135-190, 1989-2020)."""
    from smplsim_tpu.physics import control as ctrl_mod

    dtype = qpos.dtype
    has_proj = proj is not None
    if has_proj:
        p_pos0, p_vel0, p_rad, p_inv = proj
        nP = p_pos0.shape[0]
    else:
        p_pos0 = p_vel0 = jnp.zeros((0, 3), dtype)

    def substep(carry, _):
        (q, v, M_prev, C_prev, f_w, power, nact, stall, _gfc,
         p_pos, p_vel) = carry
        st = PhysicsState(qpos=q, qvel=v)
        tau = ctrl_mod.stable_pd_torque(model, M_prev, C_prev, q, v, target)
        kin = kinematics.fk(model, st.qpos)
        M = dynamics.mass_matrix(model, kin)
        C = dynamics.bias_forces(model, kin, st.qvel)
        qfrc = (
            dynamics.actuator_forces(model, tau)
            + dynamics.passive_forces(model, st.qvel)
            - C
        )
        if ext_force is not None:
            qfrc = qfrc + dynamics.external_forces(model, kin, ext_force)
        chol, qacc_smooth = linalg.cho_factor_solve(M, qfrc)
        smooth = dynamics.Smooth(M=M, chol=chol, qfrc_smooth=qfrc,
                                 qacc_smooth=qacc_smooth)
        spheres = (p_pos, p_vel, p_rad, p_inv) if has_proj else None
        efc = constraints.make_efc(model, kin, st.qpos, st.qvel, spheres)
        sol = solver.solve_constraints(model, kin, smooth, efc, f_w)
        qpos2, qvel2 = integrator.euler_step(model, q, v, sol.qacc,
                                             model.timestep)
        if has_proj:
            from smplsim_tpu.physics.constraints import MAX_PROJC

            dt = model.timestep
            ef_p = sol.efc_force[-4 * MAX_PROJC:].reshape(MAX_PROJC, 4)
            dirs = efc.W6[-MAX_PROJC:, :, 3:6]             # (K,4,3)
            F_slot = -jnp.sum(ef_p[..., None] * dirs, axis=1)   # (K,3)
            sid_oh = (efc.proj_sphere[:, None]
                      == jnp.arange(nP)[None, :]).astype(dtype)  # (K,P)
            F_s = sid_oh.T @ F_slot                             # (P,3)
            g = model.gravity
            p_vel2 = p_vel + dt * (p_inv[:, None] * F_s + g[None, :])
            p_pos2 = p_pos + dt * p_vel2
            # inelastic floor clamp (plane z=0)
            below = p_pos2[:, 2] < p_rad
            p_vel2 = p_vel2.at[:, 2].set(
                jnp.where(below, jnp.maximum(p_vel2[:, 2], 0.0),
                          p_vel2[:, 2]))
            p_pos2 = p_pos2.at[:, 2].set(
                jnp.maximum(p_pos2[:, 2], p_rad))
        else:
            p_pos2, p_vel2 = p_pos, p_vel
        bad = _state_bad(q, v, sol.qacc)
        qpos2 = jnp.where(bad, reset_qpos, qpos2)
        qvel2 = jnp.where(bad, reset_qvel, qvel2)
        M = jnp.where(bad, M_reset, M)
        C = jnp.where(bad, C_reset, C)
        f_w = jnp.where(bad, 0.0, sol.efc_force)
        power = power + jnp.where(bad, 0.0, jnp.sum(jnp.abs(tau * v[6:])))
        nact = jnp.maximum(nact, sol.nactive)
        stall = stall | sol.stalled
        return (qpos2, qvel2, M, C, f_w, power, nact, stall,
                efc.geom_floor_contact, p_pos2, p_vel2), None

    carry = (
        qpos, qvel, M0, C0, f_w0, jnp.zeros((), dtype),
        jnp.zeros((), jnp.int32), jnp.zeros((), bool),
        jnp.zeros(len(model.geom_type), bool), p_pos0, p_vel0,
    )
    carry, _ = jax.lax.scan(substep, carry, None, length=control_freq_inv)
    return carry


@functools.lru_cache(maxsize=16)
def _uhc_op_for(control_freq_inv: int, has_ext: bool, has_proj: bool = False):
    """(custom_jvp ∘ custom_vmap) uhc_pd control-loop op. Per-env calls and
    jacfwd (MPC/co-design) run the reference loop; an env vmap dispatches
    the whole batch to substep_lanes.uhc_control_lanes."""

    def ref(*args):
        base = args[:11]
        i = 11
        ext = args[i] if has_ext else None
        i += 1 if has_ext else 0
        proj = tuple(args[i:i + 4]) if has_proj else None
        out = _uhc_core_ref(*base, ext, proj,
                            control_freq_inv=control_freq_inv)
        return out if has_proj else out[:9]

    @jax.custom_batching.custom_vmap
    def _core(*args):
        return ref(*args)

    @_core.def_vmap
    def _core_vmap(axis_size, in_batched, *args):
        from smplsim_tpu.physics import substep_lanes as SL
        from smplsim_tpu.physics.solver import COMPACT_ROWS
        from smplsim_tpu.ops.qp_kernel import NEWTON_ITERS

        (model, qpos, qvel, M0, C0, f_w0, target, rq, rv, Mr, Cr) = args[:11]
        (mb, qb, vb, M0b, C0b, fwb, tb, rqb, rvb, Mrb, Crb) = in_batched[:11]
        i = 11
        if has_ext:
            ext, extb = args[i], in_batched[i]
            i += 1
        else:
            ext, extb = None, False
        if has_proj:
            proj, projb = args[i:i + 4], in_batched[i:i + 4]
        else:
            proj, projb = None, None

        def lanes(x, b):
            if x is None:
                return None
            if not b:
                return x
            return jnp.moveaxis(x, 0, -1)

        # state must be batched; broadcast if a caller vmapped only the model
        def force_b(x, b):
            return (x, True) if b else (
                jnp.broadcast_to(x[None], (axis_size,) + x.shape), True)

        qpos, qb = force_b(qpos, qb)
        qvel, vb = force_b(qvel, vb)
        M0, M0b = force_b(M0, M0b)
        C0, C0b = force_b(C0, C0b)
        f_w0, fwb = force_b(f_w0, fwb)
        target, tb = force_b(target, tb)
        if has_proj:
            # sphere state must be batched (per-env projectiles)
            proj = tuple(force_b(x, b)[0] for x, b in zip(proj, projb))
            projT = tuple(jnp.moveaxis(x, 0, -1) for x in proj)
        else:
            projT = None

        model_l = jax.tree.map(lanes, model, mb)
        model_axes = jax.tree.map(lambda b: -1 if b else None, mb)
        outs = SL.uhc_control_lanes(
            model_l, model_axes,
            lanes(qpos, qb), lanes(qvel, vb), lanes(M0, M0b),
            lanes(C0, C0b), lanes(f_w0, fwb), lanes(target, tb),
            lanes(rq, rqb), lanes(rv, rvb), lanes(Mr, Mrb), lanes(Cr, Crb),
            lanes(ext, extb) if has_ext else None,
            projT,
            control_freq_inv=control_freq_inv,
            qp_iters=NEWTON_ITERS, K=min(COMPACT_ROWS, constraints.NEFC),
        )
        outs = tuple(jnp.moveaxis(o, -1, 0) for o in outs)
        return outs, (True,) * len(outs)

    @jax.custom_jvp
    def _op(*args):
        return _core(*args)

    @_op.defjvp
    def _op_jvp(primals, tangents):
        # differentiate the reference loop (plain ops + the physics ops'
        # own custom_jvps) — MPC jacfwds / co-design gradients
        return jax.jvp(ref, primals, tangents)

    return _op
