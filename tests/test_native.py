"""Native asset-prep kernels: quickhull vs scipy oracle, quadric decimation
quality, STL round-trip (replaces scipy.ConvexHull + vtkQuadricDecimation,
reference smpl_local_robot.py:146-173 / utils/geom.py:12-36)."""
import struct

import numpy as np
import pytest
from scipy.spatial import ConvexHull

from smplsim_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def test_hull_matches_scipy_random_clouds():
    rng = np.random.default_rng(0)
    for i in range(10):
        pts = rng.normal(size=(int(rng.integers(10, 300)), 3)) * rng.uniform(0.1, 5)
        faces, vol = native.convex_hull(pts)
        sp = ConvexHull(pts)
        assert abs(vol - sp.volume) < 1e-8 * max(sp.volume, 1), i
        assert set(np.unique(faces)) == set(sp.vertices), i


def test_hull_cube_volume():
    rng = np.random.default_rng(1)
    cube = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], float
    )
    pts = np.concatenate([cube, rng.uniform(-0.9, 0.9, size=(50, 3))])
    faces, vol = native.convex_hull(pts)
    assert abs(vol - 8.0) < 1e-9
    assert set(np.unique(faces)) == set(range(8))


def test_hull_degenerate_raises():
    with pytest.raises(ValueError):
        native.convex_hull(np.zeros((10, 3)))  # coincident
    line = np.stack([np.linspace(0, 1, 10)] * 3, axis=1)
    with pytest.raises(ValueError):
        native.convex_hull(line)  # collinear


def test_decimate_preserves_shape():
    rng = np.random.default_rng(2)
    sph = rng.normal(size=(500, 3))
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    faces, vol = native.convex_hull(sph)
    v2, f2 = native.decimate(sph, faces, 60)
    assert f2.shape[0] <= 70
    assert f2.max() < v2.shape[0]
    _, vol2 = native.convex_hull(v2)
    assert abs(vol2 - vol) < 0.12 * vol


def test_write_stl(tmp_path):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3))
    faces, _ = native.convex_hull(pts)
    p = str(tmp_path / "hull.stl")
    native.write_stl(p, pts, faces)
    with open(p, "rb") as f:
        f.read(80)
        n = struct.unpack("<I", f.read(4))[0]
        body = f.read()
    assert n == faces.shape[0]
    assert len(body) == n * 50
