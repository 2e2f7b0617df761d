"""Constraint assembly: floor contacts + joint limits, MuJoCo soft-constraint
semantics.

TPU-native replacement for MuJoCo's collision + mj_makeConstraint pipeline
(the reference leans on mj_step / mj_data.contact for termination checks,
e.g. smpl_sim/envs/tasks/humanoid_speed.py:83-90). Everything is fixed-shape:
all candidate contacts are evaluated every substep, the deepest MAX_CONTACTS
are selected with top_k, inactive rows are masked. Formulas (impedance d(r),
K/B from solref, aref, R = (1-d)/d * diagApprox) were validated row-by-row
against mjData.efc_* (tests/test_contact_parity.py).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from smplsim_tpu.models.spec import GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, RobotModel
from smplsim_tpu.physics.collision_pairs import MAX_SELF, self_contacts
from smplsim_tpu.physics.kinematics import Kin
from smplsim_tpu.physics.topology import tree_masks

MAX_CONTACTS = 24   # floor contacts kept per env (deepest-first)
MAX_LIMITS = 12     # joint-limit rows kept per env
MAX_PROJC = 4       # projectile(free sphere)-vs-humanoid contacts kept
# total fixed EFC rows: [limits, 4*floor, 4*self, 4*projectile]
NEFC = MAX_LIMITS + 4 * MAX_CONTACTS + 4 * MAX_SELF + 4 * MAX_PROJC
_BIG = 1e9


def top_k_onehot(score: jax.Array, k: int):
    """Branchless top-k selection matrix via pairwise ranking.

    Returns (values (k,), onehot (k, n) float) where onehot[r] selects the
    element of rank r (first-index tie-break, matching lax.top_k). No
    sequential loop and no sort: rank[i] = #{j : s[j] > s[i]} + #{j < i :
    s[j] == s[i]} is one (n, n) comparison reduction — fully lane-parallel
    under vmap, where a k-step argmax scan or a TPU sort serializes. n here
    is a few hundred at most (contact candidate slots), so the O(n^2)
    comparisons are noise next to the serial alternatives.

    Slots beyond the number of candidates (n < k) are all-zero rows with
    -_BIG value. NaN scores are ranked last (treated as -inf).
    """
    n = score.shape[0]
    dtype = score.dtype
    s = jnp.where(jnp.isnan(score), -jnp.inf, score)
    gt = (s[None, :] > s[:, None]).astype(jnp.int32)        # (n,n): j beats i
    iota = jnp.arange(n, dtype=jnp.int32)
    tie = ((s[None, :] == s[:, None]) & (iota[None, :] < iota[:, None]))
    rank = jnp.sum(gt + tie.astype(jnp.int32), axis=1)      # (n,)
    onehot = (rank[None, :] == jnp.arange(k, dtype=jnp.int32)[:, None]
              ).astype(dtype)                               # (k,n)
    vals = onehot @ jnp.where(jnp.isfinite(s), s, jnp.full_like(s, -_BIG))
    vals = jnp.where(jnp.sum(onehot, axis=1) > 0.5, vals, -_BIG)
    return vals, onehot


def top_k_pad(score: jax.Array, k: int):
    """Top-k that tolerates fewer candidates than k (pads with -inf).

    Returns (values, indices); padded slots point at index 0 with -_BIG score
    (callers mask on score/active anyway). Selection is the branchless
    pairwise-rank construction (top_k_onehot); indices come from the
    selection matrix, so there is no sort and no sequential argmax scan.
    """
    n = score.shape[0]
    if n < k:
        pad = jnp.full(k - n, -_BIG, score.dtype)
        v, i = jax.lax.top_k(jnp.concatenate([score, pad]), k)
        return v, jnp.minimum(i, n - 1)
    vals, onehot = top_k_onehot(score, k)
    idx = (onehot @ jnp.arange(n, dtype=score.dtype)).astype(jnp.int32)
    return vals, idx


def make_frame(n: jax.Array):
    """Tangent frame for a contact normal, mju_makeFrame convention.

    seed = y-hat while |n_y| < 0.5, else z-hat (probed against sphere-sphere
    contact frames across normals; the threshold is exactly 0.5);
    t1 = Gram-Schmidt(seed), t2 = n x t1. The friction-pyramid facets follow
    t1/t2, so matching MuJoCo's seed choice is required for force parity.
    """
    dtype = n.dtype
    use_z = jnp.abs(n[..., 1]) >= 0.5
    seed = jnp.where(
        use_z[..., None],
        jnp.asarray([0.0, 0.0, 1.0], dtype),
        jnp.asarray([0.0, 1.0, 0.0], dtype),
    )
    t1 = seed - jnp.sum(seed * n, -1, keepdims=True) * n
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


class EFC(NamedTuple):
    """Fixed-size constraint rows as SPECS (4 pyramid rows per contact +
    limit rows). Dense jacobians are NOT materialized here: a contact row's
    jacobian is J = (W6 @ S^T) * (dofmask[body2] - dofmask[body1]), and only
    the solver's COMPACT_ROWS selected rows ever build it — skipping the
    (nefc, nv) batched J assembly and its HBM traffic entirely. Row order
    (for warm starts / telemetry): [limits, 4*floor contacts, 4*self
    contacts], `nefc = MAX_LIMITS + 4*(MAX_CONTACTS + MAX_SELF)`."""

    l_J: jax.Array      # (MAX_LIMITS, nv) limit rows (sign * dof one-hot)
    l_aref: jax.Array   # (MAX_LIMITS,)
    l_R: jax.Array      # (MAX_LIMITS,)
    W6: jax.Array       # (C, 4, 6) contact wrench rows [pos x dir; dir]
    body1: jax.Array    # (C,) int32, -1 = world/floor side
    body2: jax.Array    # (C,) int32
    aref: jax.Array     # (C, 4)
    R: jax.Array        # (C, 4)
    active: jax.Array   # (nefc,) bool, all rows in warm-start order
    # contact diagnostics (per selected floor contact, not per row)
    con_dist: jax.Array   # (MAX_CONTACTS,)
    con_geom: jax.Array   # (MAX_CONTACTS,) geom index (valid where con_active)
    con_pos: jax.Array    # (MAX_CONTACTS,3)
    con_active: jax.Array  # (MAX_CONTACTS,) bool
    geom_floor_contact: jax.Array  # (ngeom,) bool: any candidate within margin
    # projectile (free-sphere) contact slots: which sphere owns each of the
    # trailing MAX_PROJC contact slots (-1 = inactive) — the engine applies
    # the equal-and-opposite solved contact force to that sphere
    proj_sphere: jax.Array  # (MAX_PROJC,) int32


@functools.lru_cache(maxsize=32)
def _candidate_meta(geom_type: tuple[int, ...]):
    """Static candidate-point metadata: sphere center / capsule ends / box corners."""
    geom_idx: list[int] = []
    sign: list[tuple[float, float, float]] = []
    is_round: list[bool] = []
    for g, t in enumerate(geom_type):
        if t == GEOM_SPHERE:
            geom_idx.append(g)
            sign.append((0.0, 0.0, 0.0))
            is_round.append(True)
        elif t == GEOM_CAPSULE:
            for s in (-1.0, 1.0):
                geom_idx.append(g)
                sign.append((0.0, 0.0, s))
                is_round.append(True)
        elif t == GEOM_BOX:
            for sx in (-1.0, 1.0):
                for sy in (-1.0, 1.0):
                    for sz in (-1.0, 1.0):
                        geom_idx.append(g)
                        sign.append((sx, sy, sz))
                        is_round.append(False)
        else:
            raise ValueError(f"geom type {t}")
    return (
        np.asarray(geom_idx, dtype=np.int32),
        np.asarray(sign, dtype=np.float64),
        np.asarray(is_round, dtype=np.float64),
    )


def impedance(solimp: jax.Array, x: jax.Array) -> jax.Array:
    """MuJoCo constraint impedance d(x), x = pos - margin (<=0 when violated)."""
    dmin, dmax, width, mid, power = (
        solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3], solimp[..., 4],
    )
    r = jnp.clip(jnp.abs(x) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    y_lo = (r / mid) ** (power - 1.0) * r
    y_hi = 1.0 - ((1.0 - r) / (1.0 - mid)) ** (power - 1.0) * (1.0 - r)
    y = jnp.where(r <= mid, y_lo, y_hi)
    return jnp.clip(dmin + y * (dmax - dmin), 1e-4, 0.9999)


def solref_kb(solref: jax.Array, solimp: jax.Array):
    """Stiffness/damping (K, B) from solref (standard positive convention)."""
    dmax = solimp[..., 1]
    tc, dr = solref[..., 0], solref[..., 1]
    K = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
    B = 2.0 / jnp.maximum(dmax * tc, 1e-12)
    return K, B


def floor_contacts(model: RobotModel, kin: Kin):
    """All floor-contact candidates -> (dist, pos, geom, active) fixed arrays."""
    dtype = kin.xpos.dtype
    geom_idx, sign, is_round = _candidate_meta(model.geom_type)
    geom_idx_j = jnp.asarray(geom_idx)
    sign_j = jnp.asarray(sign, dtype=dtype)
    round_j = jnp.asarray(is_round, dtype=dtype)
    body_of_geom = np.asarray(model.geom_body, dtype=np.int32)

    g_size = model.geom_size[geom_idx_j]           # (P,3)
    g_pos = model.geom_pos[geom_idx_j]
    g_quat = model.geom_quat[geom_idx_j]
    b = jnp.asarray(body_of_geom)[geom_idx_j]
    R_b = kin.xmat[b]                               # (P,3,3)
    x_b = kin.xpos[b]

    from smplsim_tpu import transforms as T

    # endpoint offsets along the geom-frame axes: boxes use size as-is
    # (corner = (+-sx, +-sy, +-sz)); capsules store half-LENGTH in size[1]
    # (MuJoCo convention) and their segment runs along geom-frame z, so the
    # z component must read size[1], not size[2] (which is 0 for capsules)
    is_cap = jnp.asarray(
        np.asarray(
            [model.geom_type[g] == GEOM_CAPSULE for g in geom_idx], np.bool_
        )
    )
    size_eff = g_size.at[:, 2].set(
        jnp.where(is_cap, g_size[:, 1], g_size[:, 2])
    )
    offset_local = sign_j * size_eff                # (P,3) in geom frame
    p_world = x_b + jnp.einsum(
        "pij,pj->pi", R_b, g_pos + T.quat_rotate(g_quat, offset_local)
    )
    radius = round_j * g_size[:, 0]
    dist = p_world[:, 2] - radius                   # plane z=0, normal +z
    # mj_collideGeoms: pair margin = SUM of the two geom margins (verified
    # empirically: two margin-0.001 spheres get includemargin 0.002)
    incmargin = model.geom_margin[geom_idx_j] + model.floor_margin
    active = dist < incmargin

    # MuJoCo contact point: midway through the overlap, on the normal line
    con_pos = jnp.stack(
        [p_world[:, 0], p_world[:, 1], p_world[:, 2] - radius - 0.5 * dist], axis=1
    )
    # world capsule axis (geom-frame z) per candidate — mjc_PlaneCapsule
    # builds the tangent frame from its plane projection
    axis_w = jnp.einsum(
        "pij,pj->pi", R_b, T.quat_rotate(g_quat, jnp.asarray([0.0, 0.0, 1.0], dtype))
    )
    return dist, con_pos, geom_idx_j, active, incmargin, is_cap, axis_w


def make_efc(
    model: RobotModel, kin: Kin, qpos: jax.Array, qvel: jax.Array,
    spheres=None,
) -> EFC:
    """Assemble fixed-shape constraint rows (limits first, then contacts).

    `spheres` optionally adds free-flying projectile spheres as an external
    contact source (the TPU-native simulated version of the reference's
    thrown projectile assets, nv/humanoid.py:135-190): a tuple
    (pos (P,3), vel (P,3), radius (P,), invmass (P,)). Sphere-vs-geom
    contacts become ordinary pyramidal EFC rows on the humanoid (body1=-1
    external side, like the floor), with the row reference velocity shifted
    by the sphere's velocity and the sphere's inverse mass added to the
    row regularization (MuJoCo's diagApprox sums both bodies' invweights).
    The engine applies the equal-and-opposite solved force to the sphere.
    """
    dtype = qpos.dtype
    nv = model.nv
    masks = tree_masks(model.parents)
    body_dof = jnp.asarray(masks["body_dof"], dtype=dtype)  # (J,nv)

    # ---------------- joint limits ----------------
    hinge = qpos[7:]
    lo, hi = model.jnt_range[:, 0], model.jnt_range[:, 1]
    dist_lo = hinge - lo
    dist_hi = hi - hinge
    use_lo = dist_lo < dist_hi
    lpos = jnp.minimum(dist_lo, dist_hi)
    lsign = jnp.where(use_lo, 1.0, -1.0).astype(dtype)
    limited = jnp.asarray(np.asarray(model.jnt_limited), dtype=bool)
    lactive_all = (lpos < 0.0) & limited

    score = jnp.where(lactive_all, -lpos, -_BIG)
    # selection gathers as one-hot matmuls: batched gathers with dynamic
    # indices serialize on TPU; a (K,N)x(N,..) matmul stays lane-parallel
    # under the env vmap (same pattern as solver.solve_constraints)
    lval, loh = top_k_onehot(score, MAX_LIMITS)
    l_pos = loh @ lpos
    l_sign = loh @ lsign
    l_active = ((loh @ lactive_all.astype(dtype)) > 0.5) & (lval > -_BIG / 2)

    l_imp = impedance(jnp.broadcast_to(model.floor_solimp, (MAX_LIMITS, 5)), l_pos)
    lK, lB = solref_kb(model.floor_solref, model.floor_solimp)
    l_vel = l_sign * (loh @ qvel[6:])
    l_aref = -lB * l_vel - lK * l_imp * l_pos
    l_R = (1.0 - l_imp) / l_imp * (loh @ model.dof_invweight0[6:])
    l_J = jnp.pad(loh, ((0, 0), (6, 0))) * l_sign[:, None]

    # ---------------- floor contacts ----------------
    (dist, con_pos, cand_geom, cand_active, incmargin, cand_cap,
     cand_axis) = floor_contacts(model, kin)
    geom_floor_contact = jnp.zeros(model.ngeom, dtype=bool).at[cand_geom].max(
        cand_active
    )

    # static per-candidate tables (candidate -> geom/body identity is fixed
    # at trace time), selected below via ONE one-hot matmul instead of
    # per-field dynamic gathers
    cand_geom_np, _, _ = _candidate_meta(model.geom_type)
    cand_body_np = np.asarray(model.geom_body, np.int32)[cand_geom_np]
    dofmask_cand = body_dof[jnp.asarray(cand_body_np)]        # (P,nv) static
    mu_cand = jnp.maximum(
        model.geom_friction[cand_geom_np, 0], model.floor_friction[0]
    )                                                          # (P,)
    invw_cand = model.body_invweight0[cand_body_np, 0]         # (P,)

    score = jnp.where(cand_active, -dist, -_BIG)
    cval, sel_oh = top_k_onehot(score, MAX_CONTACTS)
    csel = (sel_oh @ jnp.arange(dist.shape[0], dtype=dtype)).astype(jnp.int32)
    c_dist = sel_oh @ dist
    c_pos = sel_oh @ con_pos
    c_geom = cand_geom[csel]  # (C,) int32, EFC diagnostics only
    c_active = ((sel_oh @ cand_active.astype(dtype)) > 0.5) & (cval > -_BIG / 2)
    c_margin = sel_oh @ incmargin
    c_cap = sel_oh @ cand_cap.astype(dtype)
    c_axis = sel_oh @ cand_axis

    # contact row directions: n +- mu t for t in {t1, t2}. The tangent
    # frame on the z=0 plane is GEOM-DEPENDENT in MuJoCo: plane-box and
    # plane-sphere use mju_makeFrame(+z) -> t1=(0,1,0), t2=(-1,0,0), while
    # mjc_PlaneCapsule aligns t1 with the capsule axis projected onto the
    # plane (verified against mjData.efc_J rows; the friction-pyramid
    # facets rotate with the capsule, so forces differ otherwise)
    n = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
    capf = (c_cap > 0.5)[:, None]
    proj = c_axis.at[:, 2].set(0.0)
    pnorm = jnp.sqrt(jnp.sum(proj * proj, axis=-1, keepdims=True))
    t1_cap = jnp.where(
        pnorm > 1e-8,
        proj / jnp.maximum(pnorm, 1e-8),
        jnp.asarray([0.0, 1.0, 0.0], dtype=dtype)[None, :],
    )
    t1 = jnp.where(
        capf, t1_cap, jnp.asarray([0.0, 1.0, 0.0], dtype=dtype)[None, :]
    )  # (C,3)
    t2 = jnp.where(
        capf,
        jnp.cross(jnp.broadcast_to(n, t1_cap.shape), t1_cap),
        jnp.asarray([-1.0, 0.0, 0.0], dtype=dtype)[None, :],
    )
    mu = sel_oh @ mu_cand
    dirs = (
        n[None, None, :]
        + jnp.stack([t1, -t1, t2, -t2], axis=1) * mu[:, None, None]
    )  # (C,4,3)

    # wrench rows about the world origin: W6 = [pos x dir; dir] — the row
    # jacobian is J = (W6 @ S^T) * dofmask, built by the solver ONLY for its
    # selected rows; row velocity J qvel == W6 . (body twist), computed here
    # from per-body twists without any (nefc, nv) materialization
    c_body = (sel_oh @ jnp.asarray(cand_body_np, dtype)).astype(jnp.int32)
    W6 = jnp.concatenate(
        [jnp.cross(jnp.broadcast_to(c_pos[:, None, :], dirs.shape), dirs), dirs],
        axis=-1,
    )  # (C,4,6)

    V = jnp.asarray(masks["body_dof"], dtype) @ (kin.S * qvel[:, None])  # (J,6)
    nbody = V.shape[0]
    c_b2oh = (c_body[:, None] == jnp.arange(nbody)[None, :]).astype(dtype)
    c_vel = jnp.einsum("ckw,cw->ck", W6, c_b2oh @ V)

    solimp = jnp.broadcast_to(model.floor_solimp, (MAX_CONTACTS, 5))
    c_x = c_dist - c_margin
    c_imp = impedance(solimp, c_x)
    cK, cB = solref_kb(model.floor_solref, model.floor_solimp)
    c_aref = -cB * c_vel - (cK * c_imp * c_x)[:, None]

    mu_hat = jnp.maximum(mu, 1.0)
    diag_approx = (
        (sel_oh @ invw_cand)
        * 2.0 * mu_hat**2 * (1.0 + mu_hat**2)
    )
    c_R = ((1.0 - c_imp) / c_imp * diag_approx)[:, None].repeat(4, axis=1)

    # ---------------- body-body (self) contacts ----------------
    sc = self_contacts(model, kin)
    st1, st2 = make_frame(sc.normal)
    s_mu = sc.friction
    s_dirs = (
        sc.normal[:, None, :]
        + jnp.stack([st1, -st1, st2, -st2], axis=1) * s_mu[:, None, None]
    )  # (S,4,3)
    W6_s = jnp.concatenate(
        [jnp.cross(jnp.broadcast_to(sc.pos[:, None, :], s_dirs.shape), s_dirs),
         s_dirs],
        axis=-1,
    )  # (S,4,6)
    b1_oh = (sc.body1[:, None] == jnp.arange(nbody)[None, :]).astype(dtype)
    b2_oh = (sc.body2[:, None] == jnp.arange(nbody)[None, :]).astype(dtype)
    s_vel = jnp.einsum("skw,sw->sk", W6_s, (b2_oh - b1_oh) @ V)
    s_solimp = jnp.broadcast_to(model.floor_solimp, (MAX_SELF, 5))
    s_x = sc.dist - sc.margin
    s_imp = impedance(s_solimp, s_x)
    s_aref = -cB * s_vel - (cK * s_imp * s_x)[:, None]
    s_muhat = jnp.maximum(s_mu, 1.0)
    s_diag = (
        ((b1_oh + b2_oh) @ model.body_invweight0[:, 0])
        * 2.0 * s_muhat**2 * (1.0 + s_muhat**2)
    )
    s_R = ((1.0 - s_imp) / s_imp * s_diag)[:, None].repeat(4, axis=1)

    # ---------------- projectile (free sphere) contacts ----------------
    if spheres is not None:
        from smplsim_tpu.physics import collision_pairs as _cp

        sp_pos, sp_vel, sp_rad, sp_inv = spheres           # (P,3)...
        P = sp_pos.shape[0]
        G = model.ngeom
        gidx = jnp.arange(G)
        seg_p, seg_q, seg_r, _gb = _cp._segment(model, kin, gidx)  # (G,3)..
        gbody = jnp.asarray(np.asarray(model.geom_body, np.int32))
        c = sp_pos[:, None, :]                             # (P,1,3)
        dseg = (seg_q - seg_p)[None]                       # (1,G,3)
        len2 = jnp.maximum(jnp.sum(dseg * dseg, -1), 1e-12)
        t = jnp.clip(jnp.sum((c - seg_p[None]) * dseg, -1) / len2, 0.0, 1.0)
        closest = seg_p[None] + t[..., None] * dseg        # (P,G,3)
        delta = closest - c
        gap = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, -1), 1e-18))
        n_seg = delta / gap[..., None]
        dist_seg = gap - seg_r[None] - sp_rad[:, None]
        pos_seg = c + n_seg * (sp_rad[:, None] + 0.5 * dist_seg)[..., None]

        bpos, bRot, _bb = _cp._geom_world(model, kin, gidx)    # (G,3),(G,3,3)
        lp = jnp.einsum("gji,pgj->pgi", bRot, c - bpos[None])  # (P,G,3)
        sdf, n_out = _cp._box_sdf(lp, model.geom_size[None])
        dist_box = sdf - sp_rad[:, None]
        nloc = -n_out
        ploc = lp + (sp_rad[:, None] + 0.5 * dist_box)[..., None] * nloc
        pos_box = bpos[None] + jnp.einsum("gij,pgj->pgi", bRot, ploc)
        n_box = jnp.einsum("gij,pgj->pgi", bRot, nloc)

        is_box = jnp.asarray(
            np.asarray([tg == GEOM_BOX for tg in model.geom_type]))[None]
        p_dist = jnp.where(is_box, dist_box, dist_seg)         # (P,G)
        p_pos = jnp.where(is_box[..., None], pos_box, pos_seg)
        p_norm = jnp.where(is_box[..., None], n_box, n_seg)
        p_margin = jnp.broadcast_to(model.geom_margin[None], p_dist.shape)
        p_active = p_dist < p_margin

        flat = lambda x: x.reshape((P * G,) + x.shape[2:])
        score = jnp.where(flat(p_active), -flat(p_dist), -_BIG)
        pval, p_oh = top_k_onehot(score, MAX_PROJC)            # (K,PG)
        psel = (p_oh @ jnp.arange(P * G, dtype=dtype)).astype(jnp.int32)
        k_dist = p_oh @ flat(p_dist)
        k_pos = p_oh @ flat(p_pos)
        k_norm = p_oh @ flat(p_norm)
        k_active = ((p_oh @ flat(p_active).astype(dtype)) > 0.5) & (
            pval > -_BIG / 2)
        k_margin = p_oh @ flat(p_margin)
        sphere_of_cand = jnp.repeat(jnp.arange(P, dtype=dtype), G)
        k_sphere = (p_oh @ sphere_of_cand).astype(jnp.int32)
        k_body = gbody[jnp.tile(jnp.arange(G), P)][psel]
        mu_g = jnp.maximum(model.geom_friction[:, 0], 1.0)
        k_mu = p_oh @ jnp.tile(mu_g, P)
        k_vel_s = sp_vel[k_sphere]                             # (K,3)
        k_inv_s = sp_inv[k_sphere]

        pt1, pt2 = make_frame(k_norm)
        p_dirs = (
            k_norm[:, None, :]
            + jnp.stack([pt1, -pt1, pt2, -pt2], axis=1) * k_mu[:, None, None]
        )                                                       # (K,4,3)
        W6_p = jnp.concatenate(
            [jnp.cross(jnp.broadcast_to(k_pos[:, None, :], p_dirs.shape),
                       p_dirs), p_dirs], axis=-1)              # (K,4,6)
        pb2_oh = (k_body[:, None] == jnp.arange(nbody)[None, :]).astype(dtype)
        p_vel = jnp.einsum("kaw,kw->ka", W6_p, pb2_oh @ V)
        # moving external reference: relative normal velocity subtracts the
        # sphere's velocity along each pyramid direction
        p_vel = p_vel - jnp.einsum("kad,kd->ka", p_dirs, k_vel_s)
        p_solimp = jnp.broadcast_to(model.floor_solimp, (MAX_PROJC, 5))
        p_x = k_dist - k_margin
        p_imp = impedance(p_solimp, p_x)
        p_aref = -cB * p_vel - (cK * p_imp * p_x)[:, None]
        p_muhat = jnp.maximum(k_mu, 1.0)
        p_diag = (
            (pb2_oh @ model.body_invweight0[:, 0] + k_inv_s)
            * 2.0 * p_muhat**2 * (1.0 + p_muhat**2)
        )
        p_R = ((1.0 - p_imp) / p_imp * p_diag)[:, None].repeat(4, axis=1)
        proj_sphere = jnp.where(k_active, k_sphere, -1)
        proj_body1 = jnp.full(MAX_PROJC, -1, jnp.int32)
        proj_body2 = k_body.astype(jnp.int32)
        proj_active = k_active
    else:
        z4 = jnp.zeros((MAX_PROJC, 4), dtype)
        p_aref, p_R = z4, jnp.ones((MAX_PROJC, 4), dtype)
        W6_p = jnp.zeros((MAX_PROJC, 4, 6), dtype)
        proj_sphere = jnp.full(MAX_PROJC, -1, jnp.int32)
        proj_body1 = jnp.full(MAX_PROJC, -1, jnp.int32)
        proj_body2 = jnp.zeros(MAX_PROJC, jnp.int32)
        proj_active = jnp.zeros(MAX_PROJC, bool)

    # ---------------- stack row specs ----------------
    aref = jnp.concatenate([c_aref, s_aref, p_aref], axis=0)   # (C,4)
    R = jnp.concatenate([c_R, s_R, p_R], axis=0)
    W6_all = jnp.concatenate([W6, W6_s, W6_p], axis=0)         # (C,4,6)
    body1 = jnp.concatenate(
        [jnp.full(MAX_CONTACTS, -1, jnp.int32), sc.body1.astype(jnp.int32),
         proj_body1]
    )
    body2 = jnp.concatenate([c_body, sc.body2.astype(jnp.int32), proj_body2])
    con_act4 = jnp.concatenate(
        [jnp.repeat(c_active, 4), jnp.repeat(sc.active, 4),
         jnp.repeat(proj_active, 4)]
    )
    active = jnp.concatenate([l_active, con_act4])
    # inactive-row hygiene applied on the SPEC level (the solver re-applies
    # the active mask to its built jacobian rows). Masking uses WHERE, not
    # multiplication: inactive selected slots hold garbage narrowphase
    # values whose TANGENTS can be NaN (degenerate normalizations in
    # far-apart manifolds), and 0 * NaN = NaN would poison d(qacc)/d(qpos)
    # for iLQR/co-design jacfwds (select kills the unselected branch).
    act4 = con_act4.reshape(-1, 4)
    aref = jnp.where(act4, aref, 0.0)
    R = jnp.where(act4, jnp.maximum(R, 1e-10), 1.0)
    W6_all = jnp.where(act4[..., None], W6_all, 0.0)
    l_aref = jnp.where(l_active, l_aref, 0.0)
    l_R = jnp.where(l_active, jnp.maximum(l_R, 1e-10), 1.0)
    l_J = jnp.where(l_active[:, None], l_J, 0.0)

    return EFC(
        l_J=l_J,
        l_aref=l_aref,
        l_R=l_R,
        W6=W6_all,
        body1=body1,
        body2=body2,
        aref=aref,
        R=R,
        active=active,
        con_dist=c_dist,
        con_geom=c_geom,
        con_pos=c_pos,
        con_active=c_active,
        geom_floor_contact=geom_floor_contact,
        proj_sphere=proj_sphere,
    )
