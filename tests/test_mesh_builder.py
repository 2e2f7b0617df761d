"""Mesh-geometry pipeline: STL assets + mesh MJCF compile in MuJoCo
(reference skeleton_mesh_local.py + smpl_local_robot.py:82-143 mesh branch)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from smplsim_tpu import native
from smplsim_tpu.body_model.smpl import SMPLParser
from smplsim_tpu.models.mesh_builder import build_mesh_robot, get_joint_geometries

from tests.test_body_model import make_synthetic_smpl

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def parser():
    return SMPLParser(data=make_synthetic_smpl(np.random.RandomState(0)))


def test_joint_geometries_write_stls(parser, tmp_path):
    (verts, jts, W, names, offs, parents, ch, jr) = parser.get_offsets()
    hd = get_joint_geometries(verts, jts, W, names, str(tmp_path))
    assert set(hd) == set(names)
    for n, h in hd.items():
        assert os.path.exists(h["stl"]), n
        assert h["volume"] > 0
        assert h["dec_faces"].shape[0] <= h["faces"].shape[0]


def test_mesh_mjcf_compiles_in_mujoco(parser, tmp_path):
    mujoco = pytest.importorskip("mujoco")
    xml, hull_dict = build_mesh_robot(parser, geom_dir=str(tmp_path))
    xml_path = tmp_path / "humanoid_mesh.xml"
    xml_path.write_text(xml)
    mj = mujoco.MjModel.from_xml_path(str(xml_path))
    assert mj.nbody == 24 + 1  # world + 24 bodies
    assert mj.nu == 23 * 3
    assert mj.nmesh == 24
    data = mujoco.MjData(mj)
    mujoco.mj_resetData(mj, data)
    data.qpos[2] = 1.0
    for _ in range(50):
        mujoco.mj_step(mj, data)
    assert np.isfinite(data.qpos).all()


def test_mesh_robot_beta_changes_assets(parser, tmp_path):
    _, hd0 = build_mesh_robot(parser, geom_dir=str(tmp_path / "a"))
    betas = jnp.ones((1, 10)) * 2.0
    _, hd1 = build_mesh_robot(parser, betas=betas, geom_dir=str(tmp_path / "b"))
    v0 = sum(h["volume"] for h in hd0.values())
    v1 = sum(h["volume"] for h in hd1.values())
    assert abs(v0 - v1) > 1e-9
