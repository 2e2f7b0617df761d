"""Import the reference smpl_sim package with its heavy/unavailable deps
stubbed out, so tests can run the reference MuJoCo envs as parity oracles.

Only modules the tests never exercise are stubbed (smplx LBS, mesh/vtk asset
writers, joblib pkl IO); the physics path (mujoco, gymnasium, scipy) is real.
"""
import os
import sys
import types
import xml.etree.ElementTree as _ET

REFERENCE = "/root/reference"


def _stub(name, attrs=()):
    m = types.ModuleType(name)
    for a in attrs:
        setattr(m, a, type(a, (), {}))
    sys.modules.setdefault(name, m)
    return sys.modules[name]


class _AttrDict(dict):
    """Minimal OmegaConf stand-in: attribute access + .get with default."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    __setattr__ = dict.__setitem__


def attrdict(d):
    return _AttrDict(
        {k: attrdict(v) if isinstance(v, dict) else v for k, v in d.items()}
    )


def import_reference():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    _stub("smplx", ["SMPL", "SMPLH", "SMPLX", "MANO"])
    _stub("stl", ["mesh"])
    _stub("vtk")
    _stub("easydict", ["EasyDict"])
    _stub("joblib", ["Parallel", "delayed"])
    _stub("torchgeometry")
    lxml = _stub("lxml")
    sys.modules.setdefault("lxml.etree", _ET)
    lxml.etree = _ET
    _patch_mujoco_compat()
    import smpl_sim  # noqa: F401
    return smpl_sim


# the reference targets mujoco<3.10 where mj_fullM was (model, dst, qM);
# 3.10 binds (model, data, dst). Register the live MjData here so the old
# call convention keeps working inside the reference's StablePDController.
CURRENT_DATA = [None]


def _patch_mujoco_compat():
    import mujoco
    import numpy as np

    if getattr(mujoco.mj_fullM, "_smplsim_compat", False):
        return  # already patched (import_reference runs once per test module)
    orig = mujoco.mj_fullM
    try:
        orig(None, None, None)
    except TypeError as e:
        if "d: mujoco._structs.MjData" not in str(e):
            return  # old binding still present

    def compat(m, a, b):
        if isinstance(a, mujoco.MjData):
            return orig(m, a, b)
        assert isinstance(a, np.ndarray) and CURRENT_DATA[0] is not None
        return orig(m, CURRENT_DATA[0], a)

    compat._smplsim_compat = True
    mujoco.mj_fullM = compat


# default env cfg mirroring data/cfg/{env/*.yaml,robot/smpl_humanoid.yaml}
def default_cfg(**env_overrides):
    env = dict(
        task="HumanoidEnv",
        episode_length=300,
        sim_timestep_inv=450,
        control_frequency_inv=15,
        power_scale=10.0,
        root_height_obs=True,
        enable_early_termination=True,
        self_obs_v=1,
        kp_scale=1.0,
        kd_scale=1.0,
        cycle_motion=False,
        power_reward=True,
        clip_actions=True,
        control_mode="uhc_pd",
        contact_bodies=["R_Ankle", "L_Ankle", "R_Toe", "L_Toe"],
        render_mode="human",
        camera="side",
        state_init="Default",
        pdp_scale=1,
        pdd_scale=1,
        pdi_scale=1,
        # task knobs (speed/getup/reach yaml defaults; unused keys harmless)
        tar_speed_min=0.0,
        tar_speed_max=5.0,
        speed_change_steps_min=100,
        speed_change_steps_max=200,
        recovery_steps=60,
        tar_height_min=0.5,
        tar_height_max=1.2,
        height_change_steps_min=100,
        height_change_steps_max=200,
        reach_body_name="R_Hand",
        tar_dist_max=1.0,
        tar_change_steps_min=50,
        tar_change_steps_max=100,
    )
    env.update(env_overrides)
    robot = dict(
        humanoid_type="smpl",
        has_upright_start=False,
        has_shape_obs=False,
        has_weight_obs=False,
        has_shape_variation=False,
        has_mesh=False,
        replace_feet=True,
        has_jt_limit=False,
        height_fix_mode="full",
        big_ankle=True,
        remove_toe=False,
        real_weight_porpotion_capsules=True,
        real_weight_porpotion_boxes=True,
        real_weight=True,
        box_body=True,
        smpl_data_dir="data/smpl_NONEXISTENT",  # force baked-XML fallback
        create_vel_sensors=False,
    )
    return attrdict(dict(env=env, robot=robot, headless=True))
