"""Legacy dm-control-style tasks: locomotion (tolerance-shaped reward) and
mocap playback.

Functional ports of the reference's third env generation
(smpl_sim/envs/smplenv.py + envs/tasks/{locomotion,playback}.py): the
locomotion reward composes dm_control `tolerance` terms over head height,
chest uprightness, control magnitude and CoM velocity
(tasks/locomotion.py:7-43); playback replays motion-library qpos frames
(tasks/playback.py:44-50). The reference runs these at 180 Hz physics /
30 Hz control (smplenv.py:31-32).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from smplsim_tpu.envs.base import EnvConfig, EnvState, HumanoidEnv
from smplsim_tpu.physics import kinematics
from smplsim_tpu.physics.topology import tree_masks
from smplsim_tpu.utils.tolerance import tolerance


@dataclasses.dataclass(frozen=True)
class MoveConfig(EnvConfig):
    """smplenv.py defaults: 180 Hz sim, 6 substeps -> 30 Hz control."""

    sim_timestep_inv: int = 180
    control_frequency_inv: int = 6
    move_speed: float = 0.0
    stand_height_frac: float = 0.86   # locomotion.py:9-11
    full_height: float = 1.66         # mean-neutral body height


class HumanoidMove(HumanoidEnv):
    """Stand/walk at move_speed with the dm_control-style shaped reward."""

    def __init__(self, model, config: MoveConfig | None = None):
        cfg = config or MoveConfig()
        super().__init__(model, cfg)
        self._head = model.body_names.index("Head")
        self._chest = model.body_names.index("Chest")
        masks = tree_masks(model.parents)
        # subtree_body[b, d] = body d is in the subtree rooted at b
        desc = np.asarray(masks["subtree_body"], dtype=np.float64)
        m = np.asarray(model.body_mass, dtype=np.float64)
        sub = desc[self._chest] * m
        self._chest_subtree_w = jnp.asarray(sub / sub.sum())

    def reward(self, task, phys, kin, action):
        cfg: MoveConfig = self.config
        head_height = kin.xpos[self._head, 2]
        stand_height = cfg.full_height * cfg.stand_height_frac
        standing = tolerance(
            head_height, bounds=(stand_height, float("inf")),
            margin=stand_height / 4,
        )
        chest_upright = kin.xmat[self._chest][2, 1]  # world-z of chest y-axis
        upright = tolerance(
            chest_upright, bounds=(0.9, float("inf")), sigmoid="linear",
            margin=1.9, value_at_margin=0,
        )
        stand_reward = standing * upright
        small_control = tolerance(
            action, margin=1, value_at_margin=0, sigmoid="quadratic"
        ).mean()
        small_control = (4 + small_control) / 5

        # subtree CoM velocity of the chest (mj subtree_linvel equivalent):
        # mass-weighted mean of per-body COM velocities
        V = kinematics.body_twists(self.model, kin, phys.qvel)  # (J,6)
        w_, v0 = V[:, :3], V[:, 3:]
        com_lin = v0 + jnp.cross(w_, kin.com)
        com_vel = jnp.einsum("j,jd->d", self._chest_subtree_w, com_lin)
        if cfg.move_speed == 0:
            dont_move = tolerance(com_vel[:2], margin=2).mean()
            return small_control * stand_reward * dont_move
        com_speed = jnp.linalg.norm(com_vel[:2])
        move = tolerance(
            com_speed, bounds=(cfg.move_speed, float("inf")),
            margin=cfg.move_speed, value_at_margin=0, sigmoid="linear",
        )
        move = (5 * move + 1) / 6
        return small_control * stand_reward * move


class PlaybackState(struct.PyTreeNode):
    motion_id: jax.Array   # () int32
    frame: jax.Array       # () int32


class HumanoidPlayback(HumanoidEnv):
    """Mocap playback: each step teleports to the next motion frame
    (tasks/playback.py). Useful for motion-library visual QA and FK checks."""

    def __init__(self, model, motion_lib, config: EnvConfig | None = None):
        super().__init__(model, config or EnvConfig(enable_early_termination=False))
        self.motion_lib = motion_lib

    def init_task(self, key):
        return PlaybackState(
            motion_id=jnp.zeros((), jnp.int32), frame=jnp.zeros((), jnp.int32)
        )

    def reset_task(self, key, task, cur_t):
        n = self.motion_lib.num_current_motions()
        return task.replace(
            motion_id=(task.motion_id + 1) % n, frame=jnp.zeros((), jnp.int32)
        )

    def step(self, state: EnvState, action):
        lib = self.motion_lib
        task = state.task
        nf = lib._motion_num_frames[task.motion_id]
        frame = jnp.minimum(task.frame + 1, nf - 1)
        fl = lib.length_starts[task.motion_id] + frame
        from smplsim_tpu.physics.engine import PhysicsState

        phys = PhysicsState(
            qpos=lib.qpos[fl].astype(state.phys.qpos.dtype),
            qvel=lib.qvel[fl].astype(state.phys.qvel.dtype),
        )
        kin = kinematics.fk(self.model, phys.qpos)
        task = task.replace(frame=frame)
        obs = self.compute_obs(task, phys, kin)
        cur_t = state.cur_t + 1
        return state.replace(
            phys=phys, obs=obs, cur_t=cur_t, task=task,
            reward=jnp.ones((), phys.qpos.dtype),
            truncated=frame >= nf - 1,
        )
