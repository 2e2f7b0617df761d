"""SMPLConverter cross-model remaps + pose normalization
(reference smpl_sim/smpllib/smpl_mujoco_new.py:88-401)."""
import dataclasses

import numpy as np
from scipy.spatial.transform import Rotation as sRot

import jax.numpy as jnp

from smplsim_tpu.models import registry
from smplsim_tpu.motion.converter import (
    SMPLConverter,
    body_qpos_addr,
    body_qvel_addr,
    normalize_smpl_pose,
    vertizalize_smpl_root,
)


@dataclasses.dataclass
class _FakeModel:
    """Converter only touches the body list and sizes."""

    body_names: tuple

    @property
    def nbody(self):
        return len(self.body_names)

    @property
    def nq(self):
        return 7 + 3 * (self.nbody - 1)

    @property
    def nv(self):
        return 6 + 3 * (self.nbody - 1)


def test_qpos_addr_layout():
    model = registry.default_humanoid(dtype=jnp.float64)
    addr = body_qpos_addr(model)
    assert addr[model.body_names[0]] == (0, 7)
    assert addr[model.body_names[1]] == (7, 10)
    vaddr = body_qvel_addr(model)
    assert vaddr[model.body_names[0]] == (0, 6)
    last = model.body_names[-1]
    assert addr[last][1] == model.nq and vaddr[last][1] == model.nv


def test_converter_identity_roundtrip():
    model = registry.default_humanoid(dtype=jnp.float64)
    conv = SMPLConverter(model, model)
    rng = np.random.default_rng(0)
    qpos = rng.normal(size=(5, model.nq))
    qvel = rng.normal(size=(5, model.nv))
    np.testing.assert_allclose(conv.qpos_smpl_2_new(qpos), qpos)
    np.testing.assert_allclose(conv.qvel_smpl_2_new(qvel), qvel)
    np.testing.assert_allclose(conv.qpos_new_2_smpl(qpos), qpos)
    np.testing.assert_allclose(conv.qvel_new_2_smpl(qvel), qvel)
    jpos = rng.normal(size=(5, model.nbody, 3))
    np.testing.assert_allclose(conv.jpos_new_2_smpl(jpos), jpos)


def test_converter_extended_target():
    model = registry.default_humanoid(dtype=jnp.float64)
    # target adds two extra bodies the source lacks
    new = _FakeModel(tuple(model.body_names) + ("X_Extra1", "X_Extra2"))
    conv = SMPLConverter(model, new)
    rng = np.random.default_rng(1)
    qpos = rng.normal(size=(model.nq,))
    out = conv.qpos_smpl_2_new(qpos)
    assert out.shape == (new.nq,)
    np.testing.assert_allclose(out[: model.nq], qpos)
    np.testing.assert_allclose(out[model.nq:], 0.0)
    # and back: subset recovers the source exactly
    np.testing.assert_allclose(conv.qpos_new_2_smpl(out), qpos)
    qvel = rng.normal(size=(model.nv,))
    out_v = conv.qvel_smpl_2_new(qvel)
    assert out_v.shape == (new.nv,)
    np.testing.assert_allclose(conv.qvel_new_2_smpl(out_v), qvel)

    # table sizes follow the TARGET model; unknown bodies get defaults
    assert conv.get_new_diff_weight().shape == (new.nbody,)
    assert conv.get_new_diff_weight()[-1] == 0.0
    jkp = conv.get_new_jkp()
    assert jkp.shape == ((new.nbody - 1) * 3,)
    assert (jkp[-6:] == 50).all()
    assert conv.get_new_torque_limit()[-6:].max() == 200
    assert conv.get_new_qpos_lim() == new.nq
    assert conv.get_new_qvel_lim() == new.nv
    assert conv.get_new_body_lim() == new.nbody


def test_vertizalize_and_normalize():
    rng = np.random.default_rng(2)
    pose = rng.normal(size=(8, 72)) * 0.2
    fixed = vertizalize_smpl_root(pose, [0.0, 1.0, 0.0])
    np.testing.assert_allclose(fixed[:, :3], [[0.0, 1.0, 0.0]] * 8)
    np.testing.assert_allclose(fixed[:, 3:], pose[:, 3:])

    trans = rng.normal(size=(8, 3))
    pose2, trans2 = normalize_smpl_pose(pose, trans.copy())
    # canonical heading: z euler of the root is -1.57 on every frame
    eul = sRot.from_rotvec(pose2[0, :3]).as_euler("xyz")
    assert abs(eul[2] - (-1.57)) < 1e-9
    assert (pose2[:, :3] == pose2[0, :3]).all()
    # xy re-zeroed at frame 0 before the heading rotation; z offset applied
    assert trans2.shape == (8, 3)
