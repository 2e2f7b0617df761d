"""SMPL/SMPLH/SMPLX body-model parsers on top of the JAX LBS.

Replaces the reference's smplx-package wrappers
(smpl_sim/smpllib/smpl_parser.py): loads the official model files
(.pkl/.npz), exposes get_joints_verts (pose+betas -> verts, joints) and
get_offsets (zero-pose joint offsets + skinning data for the robot builder,
smpl_parser.py:154-178). SMPL model data is licensed and not shipped; when
absent, the framework falls back to the baked neutral RobotModel exactly
like the reference falls back to its baked MJCF
(smpl_sim/envs/humanoid_env.py:249-254).
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax.numpy as jnp
import numpy as np

from smplsim_tpu.body_model.lbs import lbs
from smplsim_tpu.motion import joint_names as JN

_NUM_JOINTS = {"smpl": 24, "smplh": 52, "smplx": 55, "mano": 16}
_NUM_POSE = {"smpl": 72, "smplh": 156, "smplx": 165, "mano": 48}


def _to_np(x) -> np.ndarray:
    """Convert array-like (incl. chumpy ch objects inside legacy pkls)."""
    if hasattr(x, "r"):
        return np.asarray(x.r, dtype=np.float64)
    if hasattr(x, "toarray"):  # scipy sparse J_regressor
        return np.asarray(x.toarray(), dtype=np.float64)
    return np.asarray(x, dtype=np.float64)


def load_smpl_data(path: str) -> dict[str, np.ndarray]:
    """Load an official SMPL-family model file into plain numpy arrays."""
    if path.endswith(".npz"):
        raw = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            raw = pickle.load(f, encoding="latin1")
    out = {}
    for k in ["v_template", "shapedirs", "posedirs", "J_regressor",
              "weights", "kintree_table", "f"]:
        if k in raw:
            out[k] = _to_np(raw[k])
    return out


class SMPLParser:
    """Gender-specific SMPL model; mirrors the reference SMPL_Parser API."""

    def __init__(
        self,
        model_path: str | None = None,
        gender: str = "neutral",
        model_type: str = "smpl",
        data: dict[str, np.ndarray] | None = None,
    ):
        self.model_type = model_type
        self.gender = gender
        if data is None:
            if model_path is None:
                raise FileNotFoundError("SMPL model path or data required")
            fname = self._resolve(model_path, gender, model_type)
            data = load_smpl_data(fname)
        J = _NUM_JOINTS[model_type]
        self.v_template = jnp.asarray(data["v_template"])
        sd = np.asarray(data["shapedirs"])
        self.shapedirs = jnp.asarray(sd)
        pd = data.get("posedirs")
        if pd is not None:
            pd = np.asarray(pd)
            if pd.ndim == 3:  # (V,3,P) -> (P, V*3)
                pd = pd.reshape(-1, pd.shape[-1]).T
            self.posedirs = jnp.asarray(pd)
        else:
            self.posedirs = None
        self.J_regressor = jnp.asarray(np.asarray(data["J_regressor"])[:J])
        self.lbs_weights = jnp.asarray(np.asarray(data["weights"])[:, :J])
        kt = np.asarray(data["kintree_table"], dtype=np.int64)
        parents = kt[0][:J].copy()
        parents[0] = -1
        self.parents = tuple(int(p) for p in parents)
        # smplx: the 55-joint tree carries jaw (22) + eyes (23, 24), which
        # the robot build drops — the exposed skeleton is the 52 SMPLH-named
        # joints via parents_to_use (reference SMPLX_Parser,
        # smpl_parser.py:404 'ZL Hack': SMPLX[:22] + SMPLX[25:55] == SMPLH)
        if model_type == "smplx":
            self.parents_to_use = np.concatenate(
                [np.arange(0, 22), np.arange(25, 55)]
            )
        else:
            self.parents_to_use = np.arange(J)
        if model_type == "smpl":
            self.joint_names = list(JN.SMPL_BONE_ORDER_NAMES)
        elif model_type == "mano":
            # hand-only model (reference MANO_Parser, smpl_parser.py:541);
            # side from gender arg: "left"/"right"
            self.joint_names = list(
                JN.MANO_LEFT_BONE_ORDER_NAMES if gender == "left"
                else JN.MANO_RIGHT_BONE_ORDER_NAMES
            )
        else:
            # smplh: all 52; smplx: the 52-joint subset
            self.joint_names = list(JN.SMPLH_BONE_ORDER_NAMES)
        # default joint ranges: +-pi; elbows x4, plus shoulders x4 for
        # smpl/smplh (smpl_parser.py:100-106) but NOT smplx (:397-399)
        self.joint_range = {
            n: np.stack([-np.pi * np.ones(3), np.pi * np.ones(3)], axis=1)
            for n in self.joint_names
        }
        wide = ["L_Elbow", "R_Elbow"]
        if model_type != "smplx":
            wide += ["L_Shoulder", "R_Shoulder"]
        for n in wide:
            if n in self.joint_range:
                self.joint_range[n] = self.joint_range[n] * 4

    @staticmethod
    def _resolve(path, gender, model_type):
        cands = [
            os.path.join(path, f"{model_type.upper()}_{gender.upper()}.pkl"),
            os.path.join(path, model_type, f"{model_type.upper()}_{gender.upper()}.pkl"),
            os.path.join(path, f"{model_type}_{gender}.npz"),
            path,
        ]
        for c in cands:
            if os.path.isfile(c):
                return c
        raise FileNotFoundError(f"no SMPL data under {path} for {gender}")

    # ------------------------------------------------------------------
    def get_joints_verts(self, pose, betas=None, trans=None):
        """pose (B, J*3) axis angle; betas (B, nb). Returns (verts, joints).

        smplx also accepts the 156-dim SMPLH-layout pose (reference
        get_joints_verts, smpl_parser.py:410-435): jaw/eye joints get zero
        rotations."""
        pose = jnp.asarray(pose, jnp.float64).reshape(
            -1, _NUM_POSE[self.model_type] if self.model_type == "smpl" else pose.shape[-1]
        )
        if self.model_type == "smplx" and pose.shape[-1] == 156:
            B0 = pose.shape[0]
            pose = jnp.concatenate(
                [pose[:, :66], jnp.zeros((B0, 9), pose.dtype), pose[:, 66:]],
                axis=-1,
            )
        B = pose.shape[0]
        nb = self.shapedirs.shape[-1]
        if betas is None:
            betas = jnp.zeros((B, nb), jnp.float64)
        betas = jnp.asarray(betas, jnp.float64)[:, :nb]
        verts, joints = lbs(
            betas, pose, self.v_template, self.shapedirs, self.posedirs,
            self.J_regressor, self.parents, self.lbs_weights,
        )
        if trans is not None:
            verts = verts + trans[:, None]
            joints = joints + trans[:, None]
        return verts, joints

    def get_offsets(self, betas=None, zero_pose=None):
        """Zero-pose skeleton data for the robot builder
        (smpl_parser.py:154-178). Returns (verts (V,3), joints (J,3),
        skin_weights (V,J), joint_names, joint_offsets dict, parents dict,
        channels, joint_range dict)."""
        J = len(self.parents)
        if zero_pose is None:
            zero_pose = jnp.zeros((1, J * 3), jnp.float64)
        verts, joints = self.get_joints_verts(zero_pose, betas=betas)
        verts = np.asarray(verts[0])
        jts_full = np.asarray(joints[0])
        # exposed skeleton = parents_to_use subset (full tree for
        # smpl/smplh/mano; drops jaw/eyes for smplx). Dropped joints are
        # leaves, so every kept joint's parent is kept.
        sub = np.asarray(self.parents_to_use)
        inv = {int(s): i for i, s in enumerate(sub)}
        jts = jts_full[sub]
        joint_offsets = {
            self.joint_names[i]: (
                jts_full[s] - jts_full[self.parents[s]] if s > 0 else jts_full[s]
            )
            for i, s in enumerate(sub.tolist())
        }
        parents_dict = {
            self.joint_names[i]: (
                self.joint_names[inv[self.parents[s]]] if s > 0 else None
            )
            for i, s in enumerate(sub.tolist())
        }
        skin_weights = np.asarray(self.lbs_weights)[:, sub]
        return (
            verts, jts, skin_weights, self.joint_names,
            joint_offsets, parents_dict, ["z", "y", "x"], self.joint_range,
        )
