"""Mocap motion library: AMASS-style pkl dicts -> on-device state tensors.

Port of the reference MotionLibBase/MotionLibSMPL
(smpl_sim/smpllib/motion_lib_base.py, motion_lib_smpl.py). Differences are
architectural, not behavioral:
  * the reference forks up to 64 processes to run torch FK per motion
    (load_motions:125-150); here one jitted vmapped JAX FK pass does the
    batch on device;
  * state tensors (gts/grs/gvs/gavs/dof_pos/dvs/qpos/qvel) live as flat
    device arrays with length_starts offsets (:182-198);
  * get_motion_state / get_motion_state_intervaled are pure functions safe
    inside jit (frame blending :448-458, slerp on rotations :358-421).
PMCP adaptive sampling (hard/soft, :231-261) and termination-history
save/restore (:219-228) match the reference.
"""
from __future__ import annotations

import dataclasses
import enum
import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from smplsim_tpu import transforms as T
from smplsim_tpu.motion.fk import HumanoidBatchFK


class FixHeightMode(enum.Enum):
    no_fix = 0
    full_fix = 1
    ankle_fix = 2


@dataclasses.dataclass(frozen=True)
class MotionLibConfig:
    motion_file: str | None = None
    fix_height: FixHeightMode = FixHeightMode.no_fix
    randomize_heading: bool = True
    min_length: int = -1
    max_length: int = -1
    im_eval: bool = False  # sample by length (eval mode, motion_lib_base.py:114)


def _load_pkl(path):
    with open(path, "rb") as f:
        return pickle.load(f)


class MotionLib:
    """Host-side loader + device-side sampler."""

    def __init__(
        self,
        fk: HumanoidBatchFK,
        config: MotionLibConfig | None = None,
        motion_dict: dict[str, Any] | None = None,
    ):
        self.fk = fk
        self.cfg = config or MotionLibConfig()
        if motion_dict is None:
            motion_dict = self._load_data(self.cfg.motion_file)
        self._motion_data = motion_dict
        self._motion_data_keys = np.array(list(motion_dict.keys()))
        self._num_unique_motions = len(self._motion_data_keys)
        self._sampling_prob = (
            np.ones(self._num_unique_motions) / self._num_unique_motions
        )
        self._termination_history = np.zeros(self._num_unique_motions)
        self.curr_failed_keys = []
        self._loaded = False

    # ------------------------------------------------------------------
    @staticmethod
    def _load_data(path):
        """File or directory of pkls (motion_lib_base.py:52-76)."""
        if path is None:
            raise ValueError("motion_file or motion_dict required")
        if os.path.isdir(path):
            out = {}
            for f in sorted(os.listdir(path)):
                if f.endswith(".pkl"):
                    d = _load_pkl(os.path.join(path, f))
                    key = os.path.splitext(f)[0]
                    out[key] = d if "pose_aa" in d else d[next(iter(d))]
            return out
        data = _load_pkl(path)
        return data

    # ------------------------------------------------------------------
    def sample_motion_ids(self, rng: np.random.Generator, n: int) -> np.ndarray:
        return rng.choice(
            self._num_unique_motions, size=n, p=self._sampling_prob, replace=True
        )

    def load_motions(self, motion_ids: np.ndarray | None = None, num: int | None = None,
                     rng: np.random.Generator | None = None):
        """FK all selected motions and build the flat device arrays."""
        rng = rng or np.random.default_rng(0)
        if motion_ids is None:
            num = num or self._num_unique_motions
            motion_ids = self.sample_motion_ids(rng, num)
        self._curr_motion_ids = np.asarray(motion_ids)
        self.curr_motion_keys = self._motion_data_keys[self._curr_motion_ids]

        gts, grs, gvs, gavs, dps, dvs, qps, qvs, aas = [], [], [], [], [], [], [], [], []
        lengths, fpses, dts, num_frames = [], [], [], []
        for mid in self._curr_motion_ids:
            entry = self._motion_data[self._motion_data_keys[mid]]
            pose_aa = np.asarray(entry["pose_aa"], dtype=np.float32)  # (T, J*3) or (T,J,3)
            trans = np.asarray(
                entry.get("trans", entry.get("trans_orig")), dtype=np.float32
            )
            fps = float(entry.get("fps", 30.0))
            J = self.fk.num_joints
            if pose_aa.ndim == 2:
                # SMPL 72-dim (24*3) or 156-dim SMPLH layout -> (T,J,3)
                if pose_aa.shape[1] == 156 and J == 24:
                    pose_aa = np.concatenate(
                        [pose_aa[:, :66],
                         pose_aa[:, 75:78], pose_aa[:, 120:123]], axis=1
                    )  # 156 -> 72 (motion_lib_smpl.py:123-127)
                pose_aa = pose_aa.reshape(pose_aa.shape[0], -1, 3)[:, :J]
            Tn = pose_aa.shape[0]

            if self.cfg.randomize_heading:
                ang = rng.uniform(-np.pi, np.pi)
                rq = np.array(
                    [np.cos(ang / 2), 0, 0, np.sin(ang / 2)], dtype=np.float32
                )
                root_q = np.asarray(
                    T.quat_mul(
                        jnp.asarray(rq)[None],
                        T.exp_map_to_quat(jnp.asarray(pose_aa[:, 0])),
                    )
                )
                pose_aa = pose_aa.copy()
                pose_aa[:, 0] = np.asarray(T.quat_to_exp_map(jnp.asarray(root_q)))
                Rz = np.array(
                    [[np.cos(ang), -np.sin(ang), 0],
                     [np.sin(ang), np.cos(ang), 0],
                     [0, 0, 1]], dtype=np.float32,
                )
                trans = (trans - trans[0:1]) @ Rz.T + trans[0:1]

            fk = HumanoidBatchFK(
                np.asarray(self.fk.offsets), self.fk.parents,
                self.fk.humanoid_type, dt=1.0 / fps,
                filter_vel=self.fk.filter_vel,
            )
            out = fk.fk_batch(
                jnp.asarray(pose_aa)[None], jnp.asarray(trans)[None],
                return_full=True,
            )
            gts.append(np.asarray(out["global_translation"][0]))
            grs.append(np.asarray(out["global_rotation"][0]))
            gvs.append(np.asarray(out["global_velocity"][0]))
            gavs.append(np.asarray(out["global_angular_velocity"][0]))
            dps.append(np.asarray(out["dof_pos"][0]))
            dvs.append(np.asarray(out["dof_vels"][0]))
            qps.append(np.asarray(out["qpos"][0]))
            qvs.append(np.asarray(out["qvel"][0]))
            aas.append(pose_aa.reshape(Tn, -1))
            dts.append(1.0 / fps)
            fpses.append(fps)
            num_frames.append(Tn)
            lengths.append((Tn - 1) / fps)

        self._motion_lengths = jnp.asarray(lengths, jnp.float32)
        self._motion_fps = jnp.asarray(fpses, jnp.float32)
        self._motion_dt = jnp.asarray(dts, jnp.float32)
        self._motion_num_frames = jnp.asarray(num_frames, jnp.int32)
        self.length_starts = jnp.asarray(
            np.concatenate([[0], np.cumsum(num_frames)[:-1]]), jnp.int32
        )
        self.gts = jnp.asarray(np.concatenate(gts))
        self.grs = jnp.asarray(np.concatenate(grs))
        self.gvs = jnp.asarray(np.concatenate(gvs))
        self.gavs = jnp.asarray(np.concatenate(gavs))
        self.dof_pos = jnp.asarray(np.concatenate(dps))
        self.dvs = jnp.asarray(np.concatenate(dvs))
        self.qpos = jnp.asarray(np.concatenate(qps))
        self.qvel = jnp.asarray(np.concatenate(qvs))
        self._motion_aa = jnp.asarray(np.concatenate(aas))
        self._num_motions = len(motion_ids)
        self._loaded = True
        return self

    # ------------------------------------------------------------------
    def num_current_motions(self) -> int:
        return self._num_motions

    def num_all_motions(self) -> int:
        return self._num_unique_motions

    def get_total_length(self) -> float:
        return float(jnp.sum(self._motion_lengths))

    def get_motion_length(self, motion_ids=None):
        if motion_ids is None:
            return self._motion_lengths
        return self._motion_lengths[motion_ids]

    def get_motion_num_steps(self, motion_ids=None):
        nf = self._motion_num_frames if motion_ids is None else self._motion_num_frames[motion_ids]
        fps = self._motion_fps if motion_ids is None else self._motion_fps[motion_ids]
        return (nf * 30 / fps).astype(jnp.int32)

    def sample_time(self, key: jax.Array, motion_ids: jax.Array, truncate_time=None):
        phase = jax.random.uniform(key, motion_ids.shape)
        lens = self._motion_lengths[motion_ids]
        if truncate_time is not None:
            lens = jnp.maximum(lens - truncate_time, 0.0)
        return phase * lens

    # ------------------------------------------------------------------
    def _frame_blend(self, time, length, num_frames, dt):
        """motion_lib_base.py:448-458."""
        phase = jnp.clip(time / jnp.maximum(length, 1e-9), 0.0, 1.0)
        time = jnp.maximum(time, 0.0)
        idx0 = jnp.floor(phase * (num_frames - 1)).astype(jnp.int32)
        idx1 = jnp.minimum(idx0 + 1, num_frames - 1)
        blend = jnp.clip((time - idx0 * dt) / dt, 0.0, 1.0)
        return idx0, idx1, blend

    def get_motion_state(self, motion_ids: jax.Array, motion_times: jax.Array,
                         offset=None) -> dict[str, jax.Array]:
        """Two-frame blended state (slerp rotations), jit-safe."""
        length = self._motion_lengths[motion_ids]
        nf = self._motion_num_frames[motion_ids]
        dt = self._motion_dt[motion_ids]
        idx0, idx1, blend = self._frame_blend(motion_times, length, nf, dt)
        f0 = idx0 + self.length_starts[motion_ids]
        f1 = idx1 + self.length_starts[motion_ids]
        b = blend[..., None]
        be = blend[..., None, None]

        rg_pos = (1 - be) * self.gts[f0] + be * self.gts[f1]
        if offset is not None:
            rg_pos = rg_pos + offset[..., None, :]
        body_vel = (1 - be) * self.gvs[f0] + be * self.gvs[f1]
        body_ang_vel = (1 - be) * self.gavs[f0] + be * self.gavs[f1]
        dof_pos = (1 - b[..., None]) * self.dof_pos[f0] + b[..., None] * self.dof_pos[f1]
        dof_vel = (1 - b[..., None]) * self.dvs[f0] + b[..., None] * self.dvs[f1]
        rb_rot = T.quat_slerp(self.grs[f0], self.grs[f1], be)
        N = motion_ids.shape[0]
        return {
            "root_pos": rg_pos[..., 0, :],
            "root_rot": rb_rot[..., 0, :],
            "dof_pos": dof_pos.reshape(N, -1),
            "root_vel": body_vel[..., 0, :],
            "root_ang_vel": body_ang_vel[..., 0, :],
            "dof_vel": dof_vel.reshape(N, -1),
            "motion_aa": self._motion_aa[f0],
            "rg_pos": rg_pos,
            "rb_rot": rb_rot,
            "body_vel": body_vel,
            "body_ang_vel": body_ang_vel,
        }

    def get_motion_state_intervaled(self, motion_ids, motion_times, offset=None):
        """Nearest-frame variant (motion_lib_base.py:313-354)."""
        length = self._motion_lengths[motion_ids]
        nf = self._motion_num_frames[motion_ids]
        dt = self._motion_dt[motion_ids]
        idx0, idx1, blend = self._frame_blend(motion_times, length, nf, dt)
        idx = ((1.0 - blend) * idx0 + blend * idx1).astype(jnp.int32)
        fl = idx + self.length_starts[motion_ids]
        xpos = self.gts[fl]
        if offset is not None:
            xpos = xpos + offset[..., None, :]
        N = motion_ids.shape[0]
        return {
            "root_pos": xpos[..., 0, :],
            "root_rot": self.grs[fl][..., 0, :],
            "dof_pos": self.dof_pos[fl].reshape(N, -1),
            "root_vel": self.gvs[fl][..., 0, :],
            "root_ang_vel": self.gavs[fl][..., 0, :],
            "dof_vel": self.dvs[fl].reshape(N, -1),
            "motion_aa": self._motion_aa[fl],
            "xpos": xpos,
            "xquat": self.grs[fl],
            "body_vel": self.gvs[fl],
            "body_ang_vel": self.gavs[fl],
            "qpos": self.qpos[fl],
            "qvel": self.qvel[fl],
        }

    # ---------------- PMCP adaptive sampling ----------------
    def update_hard_sampling_weight(self, failed_keys):
        """Train on failed sequences only (motion_lib_base.py:231-242)."""
        if len(failed_keys):
            all_keys = self._motion_data_keys.tolist()
            idx = [all_keys.index(k) for k in failed_keys]
            self._sampling_prob[:] = 0
            self._sampling_prob[idx] = 1.0 / len(idx)
        else:
            self._sampling_prob = (
                np.ones(self._num_unique_motions) / self._num_unique_motions
            )

    def update_soft_sampling_weight(self, failed_keys):
        """Weight by accumulated failures (motion_lib_base.py:244-261)."""
        if len(failed_keys):
            self.curr_failed_keys = failed_keys
            all_keys = self._motion_data_keys.tolist()
            idx = [all_keys.index(k) for k in failed_keys]
            self._termination_history[idx] += 1
            self.update_sampling_prob(self._termination_history)
        else:
            self._sampling_prob = (
                np.ones(self._num_unique_motions) / self._num_unique_motions
            )

    def update_sampling_prob(self, termination_history) -> bool:
        if len(self._sampling_prob) == len(termination_history):
            self._sampling_prob[:] = termination_history / termination_history.sum()
            self._termination_history = termination_history
            return True
        return False

    def get_termination_history(self):
        return {
            "termination_history": self._termination_history,
            "failed_keys": self.curr_failed_keys,
        }

    def set_termination_history(self, h):
        self._termination_history = h["termination_history"]
        self.curr_failed_keys = h["failed_keys"]
        self.update_sampling_prob(self._termination_history)
