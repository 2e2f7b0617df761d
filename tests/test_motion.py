"""Motion library tests: batched FK vs MuJoCo (the reference's own
correctness oracle, torch_smpl_humanoid_batch.py:340-357), qpos/qvel
assembly, state sampling/blending, PMCP weights."""
import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smplsim_tpu.models import registry
from smplsim_tpu.motion import HumanoidBatchFK, MotionLib, MotionLibConfig
from tests.conftest import REFERENCE_XML


@pytest.fixture(scope="module")
def fk64():
    model = registry.default_humanoid(dtype=jnp.float64)
    return HumanoidBatchFK.from_robot_model(model, filter_vel=False)


def smooth_motion(rng, T, J, scale=0.4):
    """Random smooth pose_aa (T,J,3) + trans (T,3)."""
    aa = rng.randn(4, J, 3) * scale
    t = np.linspace(0, 1, T)
    # cubic interp through 4 keyframes
    from numpy.polynomial import polynomial as _  # noqa: F401
    import numpy as np2
    xs = np.linspace(0, 1, 4)
    pose = np.stack(
        [np.interp(t, xs, aa[:, j, d]) for j in range(J) for d in range(3)],
        axis=1,
    ).reshape(T, J, 3)
    trans = np.stack(
        [np.interp(t, xs, rng.randn(4) * 0.3) for _ in range(3)], axis=1
    )
    trans[:, 2] += 1.0
    return pose, trans


def test_fk_matches_mujoco(fk64):
    rng = np.random.RandomState(0)
    T = 5
    pose, trans = smooth_motion(rng, T, fk64.num_joints)
    out = fk64.fk_batch(jnp.asarray(pose)[None], jnp.asarray(trans)[None],
                        return_full=True)
    qpos = np.asarray(out["qpos"][0])        # (T, nq)
    xpos = np.asarray(out["global_translation"][0])
    xquat = np.asarray(out["global_rotation"][0])

    mj_model = mujoco.MjModel.from_xml_path(REFERENCE_XML)
    mj_data = mujoco.MjData(mj_model)
    for t in range(T):
        mj_data.qpos[:] = qpos[t]
        mujoco.mj_kinematics(mj_model, mj_data)
        np.testing.assert_allclose(
            xpos[t], mj_data.xpos[1:], atol=2e-5,
            err_msg=f"xpos mismatch at t={t}",
        )
        # quaternions up to sign
        q_mj = mj_data.xquat[1:]
        dot = np.abs(np.sum(q_mj * xquat[t], axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_qpos_roundtrip(fk64):
    rng = np.random.RandomState(1)
    pose, trans = smooth_motion(rng, 3, fk64.num_joints, scale=0.3)
    out = fk64.fk_batch(jnp.asarray(pose)[None], jnp.asarray(trans)[None],
                        return_full=True)
    qpos = out["qpos"][0]
    root_pos, pose_aa = fk64.qpos_to_pose_aa(qpos)
    np.testing.assert_allclose(np.asarray(root_pos), trans, atol=1e-8)
    # axis-angle is not unique; compare resulting quats up to sign
    from smplsim_tpu import transforms as Tr
    q0 = np.asarray(Tr.exp_map_to_quat(jnp.asarray(pose)))
    q1 = np.asarray(Tr.exp_map_to_quat(pose_aa))
    dot = np.abs(np.sum(q0 * q1, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-7)


@pytest.fixture(scope="module")
def lib(fk64):
    rng = np.random.RandomState(2)
    motions = {}
    for i, T in enumerate([20, 31]):
        pose, trans = smooth_motion(rng, T, fk64.num_joints, scale=0.3)
        motions[f"m{i}"] = {"pose_aa": pose.reshape(T, -1), "trans": trans,
                            "fps": 30.0}
    lib = MotionLib(fk64, MotionLibConfig(randomize_heading=False),
                    motion_dict=motions)
    return lib.load_motions(np.array([0, 1]))


def test_motion_state_endpoints(lib):
    ids = jnp.asarray([0, 1])
    st0 = lib.get_motion_state(ids, jnp.zeros(2))
    # frame zero reproduced exactly
    np.testing.assert_allclose(
        np.asarray(st0["rg_pos"][0]),
        np.asarray(lib.gts[0]), atol=1e-7,
    )
    st_end = lib.get_motion_state(ids, lib.get_motion_length(ids))
    end_idx = int(lib.length_starts[1]) - 1
    np.testing.assert_allclose(
        np.asarray(st_end["rg_pos"][0]), np.asarray(lib.gts[end_idx]), atol=1e-7
    )


def test_motion_state_blend_midframe(lib):
    """Halfway between frames: linear blend of positions."""
    ids = jnp.asarray([0])
    dt = float(lib._motion_dt[0])
    tmid = jnp.asarray([1.5 * dt])
    st = lib.get_motion_state(ids, tmid)
    expect = 0.5 * (np.asarray(lib.gts[1]) + np.asarray(lib.gts[2]))
    np.testing.assert_allclose(np.asarray(st["rg_pos"][0]), expect, atol=1e-7)


def test_intervaled_returns_qpos(lib):
    ids = jnp.asarray([0, 1])
    st = lib.get_motion_state_intervaled(ids, jnp.zeros(2))
    assert st["qpos"].shape == (2, 7 + 3 * (lib.fk.num_joints - 1))
    assert st["qvel"].shape == (2, 6 + 3 * (lib.fk.num_joints - 1))


def test_pmcp_sampling_weights(lib):
    lib.update_hard_sampling_weight(["m1"])
    assert lib._sampling_prob[1] == 1.0 and lib._sampling_prob[0] == 0.0
    lib.update_hard_sampling_weight([])
    np.testing.assert_allclose(lib._sampling_prob, [0.5, 0.5])
    lib.update_soft_sampling_weight(["m0"])
    assert lib._sampling_prob[0] == 1.0
    # the reference checkpoints this dict through joblib (a deep copy)
    h = {k: np.copy(v) if isinstance(v, np.ndarray) else v
         for k, v in lib.get_termination_history().items()}
    lib.update_soft_sampling_weight(["m1"])
    lib.set_termination_history(h)
    assert lib._sampling_prob[0] == 1.0
