"""Batched (lanes-last) self-collision pipeline vs the per-env reference path.

ADVICE r4: the 882-line collision_lanes twin runs on EVERY production batch
step via custom_vmap, but nothing compared its output against the per-env
reference path (MuJoCo parity tests run the reference path unvmapped).
Here a heterogeneous batch of collapsed/lying humanoid poses (real MuJoCo
drop trajectories, so cc/cb/bb families are all exercised) runs through

  * jax.vmap(candidates_op)  -> collision_lanes.self_candidates_lanes
  * a python loop of unbatched candidates_op -> _self_candidates_ref

and the selected contact slots must agree — in f64 (tight: both paths are
the same algebra, only reduction order differs) and f32 (loose: marginal
contacts within f32 noise of the margin threshold are excluded), with the
broadphase culls both OFF (wide keeps) and ON (shipped defaults).
"""
import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from smplsim_tpu.models import mjcf
from smplsim_tpu.physics import collision_pairs as CP
from smplsim_tpu.physics import kinematics
from tests.conftest import REFERENCE_XML

WIDE = (4096, 4096, 4096)
DEFAULT = (24, 16, 8)  # the shipped CC/CB/BB_KEEP defaults


@pytest.fixture(scope="module")
def pose_set():
    """Collapsed / tumbling humanoid poses from MuJoCo drop trajectories —
    the calibration-style pose set where self-contacts are dense."""
    with open(REFERENCE_XML) as f:
        xml = f.read()
    model = mjcf.parse_mjcf(xml, dtype=jnp.float64).replace(
        timestep=jnp.float64(1.0 / 450.0)
    )
    mj_model = mujoco.MjModel.from_xml_string(xml)
    mj_model.opt.timestep = 1.0 / 450.0
    qposes = []
    for quat, spin in (
        ([0.5, 0.5, 0.5, 0.5], 2.0),   # sideways drop
        ([0.7071068, 0.7071068, 0, 0], -3.0),  # face-down drop
    ):
        mj_data = mujoco.MjData(mj_model)
        mj_data.qpos[2] = 0.94
        mj_data.qpos[3:7] = quat
        mj_data.qvel[3] = spin
        for t in range(400):
            mujoco.mj_step(mj_model, mj_data)
            if t % 100 == 99:
                qposes.append(mj_data.qpos.copy())
    return model, np.stack(qposes)  # (8, nq)


def _op(model, keeps):
    contype = model.geom_contype or tuple(7 for _ in model.geom_type)
    conaffinity = model.geom_conaffinity or tuple(1 for _ in model.geom_type)
    return CP._candidates_op(
        model.parents, model.geom_body, model.geom_type, contype,
        conaffinity, model.contact_excludes, keeps)


def _run(model, qposes, keeps, dtype, batched):
    m = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, model)
    op = _op(m, keeps)

    def one(q):
        kin = kinematics.fk(m, q.astype(dtype))
        return op(kin.xpos, kin.xmat, m.geom_pos, m.geom_quat, m.geom_size,
                  m.geom_friction, m.geom_margin)

    qb = jnp.asarray(qposes)
    if batched:
        out = jax.jit(jax.vmap(one))(qb)
        return [jax.tree.map(lambda x: np.asarray(x[i]), out)
                for i in range(qb.shape[0])]
    return [jax.tree.map(np.asarray, one(qb[i])) for i in range(qb.shape[0])]


def _contact_dict(out, skip_marginal=0.0):
    """active slots -> {(b1,b2): sorted dists}; drops contacts within
    `skip_marginal` of their activation threshold (f32 tie noise)."""
    dist, pos, normal, b1, b2, mu, margin, active = out
    d = {}
    for i in range(len(active)):
        if not active[i]:
            continue
        if skip_marginal and margin[i] - dist[i] < skip_marginal:
            continue
        d.setdefault((int(b1[i]), int(b2[i])), []).append(
            (float(dist[i]), tuple(np.round(pos[i], 5))))
    return {k: sorted(v) for k, v in d.items()}


@pytest.mark.parametrize("keeps", [WIDE, DEFAULT],
                         ids=["cull-off", "cull-default"])
def test_lanes_matches_reference_f64(pose_set, keeps):
    model, qposes = pose_set
    ref = _run(model, qposes, keeps, jnp.float64, batched=False)
    lanes = _run(model, qposes, keeps, jnp.float64, batched=True)
    n_active = 0
    for r, l in zip(ref, lanes):
        dr = _contact_dict(r)
        dl = _contact_dict(l)
        assert set(dr) == set(dl)
        for k in dr:
            n_active += len(dr[k])
            for (d1, p1), (d2, p2) in zip(dr[k], dl[k]):
                assert abs(d1 - d2) < 1e-9, (k, d1, d2)
                np.testing.assert_allclose(p1, p2, atol=1e-7)
    assert n_active >= 8, "pose set failed to produce self-contacts"


def test_lanes_matches_reference_f32(pose_set):
    model, qposes = pose_set
    ref = _run(model, qposes, WIDE, jnp.float32, batched=False)
    lanes = _run(model, qposes, WIDE, jnp.float32, batched=True)
    for r, l in zip(ref, lanes):
        # exclude contacts within f32 noise of activation: the two paths
        # may disagree on whether a grazing pair crosses the margin
        dr = _contact_dict(r, skip_marginal=2e-4)
        dl = _contact_dict(l, skip_marginal=2e-4)
        common = set(dr) & set(dl)
        assert len(common) >= max(len(dr), len(dl)) - 1
        for k in common:
            d1 = dr[k][0][0]
            d2 = dl[k][0][0]
            assert abs(d1 - d2) < 5e-4, (k, d1, d2)


def test_default_keeps_match_wide(pose_set):
    """ADVICE r4: the shipped broadphase keeps (CC 24 / CB 16 / BB 8) must
    select the same contacts as no-cull on the calibration pose set — a
    touching pair being evicted by loose-bound far pairs would show here."""
    model, qposes = pose_set
    wide = _run(model, qposes, WIDE, jnp.float64, batched=False)
    tight = _run(model, qposes, DEFAULT, jnp.float64, batched=False)
    for w, t in zip(wide, tight):
        dw = _contact_dict(w)
        dt = _contact_dict(t)
        assert set(dw) == set(dt)
        for k in dw:
            assert len(dw[k]) == len(dt[k])
            for (d1, _), (d2, _) in zip(dw[k], dt[k]):
                assert abs(d1 - d2) < 1e-12
