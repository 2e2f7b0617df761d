"""Poselib tests: MJCF round trip, FK vs the physics kinematics, node
dropping with translation re-accumulation, t-pose retargeting identity."""
import numpy as np
import jax.numpy as jnp

from smplsim_tpu import transforms as T
from smplsim_tpu.models import registry
from smplsim_tpu.poselib import SkeletonMotion, SkeletonState, SkeletonTree
from tests.conftest import REFERENCE_XML


def test_from_mjcf_matches_robot_model():
    tree = SkeletonTree.from_mjcf(REFERENCE_XML)
    model = registry.default_humanoid(dtype=jnp.float64)
    assert tree.node_names == list(model.body_names)
    assert tuple(tree.parent_indices) == model.parents
    np.testing.assert_allclose(
        tree.local_translation, np.asarray(model.body_pos), atol=1e-6
    )


def test_fk_matches_physics_kinematics():
    from smplsim_tpu.physics import kinematics

    model = registry.default_humanoid(dtype=jnp.float64)
    tree = SkeletonTree.from_robot_model(model)
    rng = np.random.RandomState(0)
    qpos = np.zeros(model.nq)
    qpos[0:3] = [0.3, -0.2, 1.0]
    q = rng.randn(4); qpos[3:7] = q / np.linalg.norm(q)
    qpos[7:] = rng.uniform(-0.5, 0.5, model.nq - 7)

    local_q = jnp.concatenate(
        [jnp.asarray(qpos[None, 3:7]),
         T.euler_xyz_to_quat(jnp.asarray(qpos[7:]).reshape(-1, 3))],
        axis=0,
    )
    st = SkeletonState(tree, local_q, jnp.asarray(qpos[0:3]))

    kin = kinematics.fk(model, jnp.asarray(qpos))
    bq = kinematics.body_quats(model, jnp.asarray(qpos))
    np.testing.assert_allclose(
        np.asarray(st.global_translation), np.asarray(kin.xpos), atol=1e-10
    )
    dot = np.abs(np.sum(np.asarray(st.global_rotation) * np.asarray(bq), -1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-10)


def test_keep_nodes_reaccumulates_translation():
    tree = SkeletonTree(
        ["a", "b", "c", "d"], [-1, 0, 1, 2],
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
    )
    sub = tree.keep_nodes_by_names(["a", "c", "d"])
    assert sub.node_names == ["a", "c", "d"]
    # c's offset absorbs dropped b
    np.testing.assert_allclose(sub.local_translation[1], [1, 1, 0])
    np.testing.assert_allclose(sub.local_translation[2], [0, 0, 1])
    assert list(sub.parent_indices) == [-1, 0, 1]


def test_retarget_identity_recovers_pose():
    """Retargeting a motion to the SAME skeleton with identity mapping and
    identity frame rotation reproduces the global rotations."""
    model = registry.default_humanoid(dtype=jnp.float64)
    tree = SkeletonTree.from_robot_model(model)
    J = len(tree)
    rng = np.random.RandomState(1)
    T_frames = 3
    aa = rng.randn(T_frames, J, 3) * 0.2
    local_q = T.exp_map_to_quat(jnp.asarray(aa))
    root_t = jnp.asarray(rng.randn(T_frames, 3) * 0.1 + np.array([0, 0, 1.0]))
    motion = SkeletonMotion(tree, local_q, root_t, fps=30)

    tpose = SkeletonState.zero_pose(tree)
    mapping = {n: n for n in tree.node_names}
    out = motion.retarget_to_by_tpose(
        mapping, tpose, tpose,
        rotation_to_target_skeleton=jnp.asarray([1.0, 0, 0, 0]),
        scale_to_target_skeleton=1.0,
    )
    g0 = np.asarray(motion.global_rotation)
    g1 = np.asarray(out.global_rotation)
    dot = np.abs(np.sum(g0 * g1, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-8)
    # root translation preserved up to the tpose offset convention
    d0 = np.asarray(motion.root_translation) - np.asarray(motion.root_translation)[0]
    d1 = np.asarray(out.root_translation) - np.asarray(out.root_translation)[0]
    np.testing.assert_allclose(d0, d1, atol=1e-8)


def test_motion_velocities_shapes():
    model = registry.default_humanoid(dtype=jnp.float64)
    tree = SkeletonTree.from_robot_model(model)
    J = len(tree)
    motion = SkeletonMotion(
        tree, T.quat_identity((5, J), jnp.float64), jnp.zeros((5, 3)), fps=30
    )
    assert motion.global_velocity.shape == (5, J, 3)
    assert motion.global_angular_velocity.shape == (5, J, 3)
    assert motion.crop(1, 4).global_translation.shape[0] == 3


def test_from_npz_round_trip(tmp_path):
    """Synthetic npz in the tools/fbx2npz.py layout loads into a
    SkeletonMotion that reproduces the arrays (ADVICE r4: from_npz had no
    coverage)."""
    rng = np.random.RandomState(3)
    names = np.asarray(["Hips", "Spine", "Head", "LeftLeg"])
    parents = np.asarray([-1, 0, 1, 0], np.int64)
    local_t = rng.randn(4, 3).astype(np.float32)
    T_frames = 6
    aa = rng.randn(T_frames, 4, 3) * 0.3
    local_q = np.asarray(T.exp_map_to_quat(jnp.asarray(aa)), np.float32)
    root_t = rng.randn(T_frames, 3).astype(np.float32)
    path = tmp_path / "clip.npz"
    np.savez(path, node_names=names, parent_indices=parents,
             local_translation=local_t, local_rotation=local_q,
             root_translation=root_t, fps=24.0)

    motion = SkeletonMotion.from_npz(str(path))
    assert motion.fps == 24.0
    assert motion.skeleton_tree.node_names == [str(n) for n in names]
    assert list(motion.skeleton_tree.parent_indices) == list(parents)
    np.testing.assert_allclose(
        np.asarray(motion.local_rotation), local_q, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(motion.root_translation), root_t, atol=1e-7)
    # derived FK runs on the loaded tree
    assert motion.global_translation.shape == (T_frames, 4, 3)
    assert motion.global_velocity.shape == (T_frames, 4, 3)


def test_from_fbx_without_sdk_raises():
    import importlib.util
    if importlib.util.find_spec("fbx") is not None:
        import pytest
        pytest.skip("FBX SDK present")
    try:
        SkeletonMotion.from_fbx("/nonexistent/clip.fbx")
    except NotImplementedError as e:
        assert "fbx2npz" in str(e)
    else:
        raise AssertionError("expected NotImplementedError without the SDK")
