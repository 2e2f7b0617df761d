"""Goal-conditioned humanoid tasks: speed, getup, reach.

Functional ports of the reference tasks (smpl_sim/envs/tasks/
humanoid_{speed,getup,reach}.py): identical rewards, task observations,
resample schedules, termination rules and default config values
(data/cfg/env/{speed,getup,reach}.yaml). Task state is a pytree carried in
EnvState.task; "resample every N-M steps" becomes an always-sample +
where-select so the step stays trace-friendly.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from smplsim_tpu import transforms as T
from smplsim_tpu.envs.base import EnvConfig, HumanoidEnv
from smplsim_tpu.physics import kinematics
from smplsim_tpu.physics.engine import PhysicsState


def _heading_inv(root_rot: jax.Array, upright_start: bool, humanoid_type: str):
    if not upright_start:
        root_rot = T.remove_base_rot(root_rot, humanoid_type)
    return T.calc_heading_quat_inv(root_rot)


# =========================================================================
# Speed
# =========================================================================


@dataclasses.dataclass(frozen=True)
class SpeedConfig(EnvConfig):
    """data/cfg/env/speed.yaml"""

    tar_speed_min: float = 0.0
    tar_speed_max: float = 5.0
    speed_change_steps_min: int = 100
    speed_change_steps_max: int = 200


class SpeedTask(struct.PyTreeNode):
    tar_speed: jax.Array        # ()
    change_step: jax.Array      # () int32: resample when cur_t reaches this
    prev_root_pos: jax.Array    # (3,) cached before physics


class HumanoidSpeed(HumanoidEnv):
    """Run at a commanded speed along +x (tasks/humanoid_speed.py).

    reward = exp(-0.25 ((v_x - v*)^2 + 0.1 v_y^2)), v from root displacement
    over the control step; obs = heading-local +x dir (2) + tar_speed (1).
    """

    def __init__(self, model, config: SpeedConfig | None = None):
        super().__init__(model, config or SpeedConfig())

    @property
    def task_obs_size(self) -> int:
        return 3

    def init_task(self, key):
        dtype = self.model.qpos0.dtype
        return SpeedTask(
            tar_speed=jnp.zeros((), dtype),
            change_step=jnp.zeros((), jnp.int32),
            prev_root_pos=jnp.zeros((3,), dtype),
        )

    def _sample(self, key, task: SpeedTask, cur_t):
        cfg: SpeedConfig = self.config
        k1, k2 = jax.random.split(key)
        speed = jax.random.uniform(
            k1, (), task.tar_speed.dtype,
            minval=cfg.tar_speed_min, maxval=cfg.tar_speed_max,
        )
        steps = jax.random.randint(
            k2, (), cfg.speed_change_steps_min, cfg.speed_change_steps_max
        )
        return task.replace(tar_speed=speed, change_step=cur_t + steps)

    def reset_task(self, key, task, cur_t):
        return self._sample(key, task, cur_t)

    def update_task(self, key, task: SpeedTask, cur_t):
        fresh = self._sample(key, task, cur_t)
        due = cur_t >= task.change_step
        return jax.tree.map(lambda a, b: jnp.where(due, a, b), fresh, task)

    def pre_physics(self, task: SpeedTask, phys, kin):
        return task.replace(prev_root_pos=kin.xpos[0])

    def task_obs(self, task: SpeedTask, phys, kin):
        heading_inv = _heading_inv(
            phys.qpos[3:7], self.upright_start, self.model.humanoid_type
        )
        tar_dir3d = jnp.asarray([1.0, 0.0, 0.0], phys.qpos.dtype)
        local_dir = T.quat_rotate(heading_inv, tar_dir3d)[:2]
        return jnp.concatenate([local_dir, task.tar_speed[None]])

    def reward(self, task: SpeedTask, phys, kin, action):
        root_vel = (kin.xpos[0] - task.prev_root_pos) / self.config.dt
        tar_err = task.tar_speed - root_vel[0]
        tangent = root_vel[1]
        return jnp.exp(-0.25 * (tar_err * tar_err + 0.1 * tangent * tangent))


# =========================================================================
# Getup
# =========================================================================


@dataclasses.dataclass(frozen=True)
class GetupConfig(EnvConfig):
    """data/cfg/env/getup.yaml"""

    state_init: str = "Fall"
    recovery_steps: int = 60
    tar_height_min: float = 0.5
    tar_height_max: float = 1.2
    height_change_steps_min: int = 100
    height_change_steps_max: int = 200


class GetupTask(struct.PyTreeNode):
    tar_height: jax.Array         # ()
    change_step: jax.Array        # () int32
    recovery_counter: jax.Array   # () int32: no termination while > 0


class HumanoidGetup(HumanoidEnv):
    """Recover from a fall to a commanded root height
    (tasks/humanoid_getup.py): reward = exp(-4 (h* - h)^2); termination is
    suppressed for recovery_steps after each reset."""

    def __init__(self, model, config: GetupConfig | None = None):
        super().__init__(model, config or GetupConfig())

    @property
    def task_obs_size(self) -> int:
        return 1

    def init_task(self, key):
        dtype = self.model.qpos0.dtype
        return GetupTask(
            tar_height=jnp.zeros((), dtype),
            change_step=jnp.zeros((), jnp.int32),
            recovery_counter=jnp.zeros((), jnp.int32),
        )

    def _sample(self, key, task: GetupTask, cur_t):
        cfg: GetupConfig = self.config
        k1, k2 = jax.random.split(key)
        height = jax.random.uniform(
            k1, (), task.tar_height.dtype,
            minval=cfg.tar_height_min, maxval=cfg.tar_height_max,
        )
        steps = jax.random.randint(
            k2, (), cfg.height_change_steps_min, cfg.height_change_steps_max
        )
        return task.replace(tar_height=height, change_step=cur_t + steps)

    def reset_task(self, key, task, cur_t):
        task = self._sample(key, task, cur_t)
        return task.replace(
            recovery_counter=jnp.asarray(self.config.recovery_steps, jnp.int32)
        )

    def update_task(self, key, task: GetupTask, cur_t):
        fresh = self._sample(key, task, cur_t)
        due = cur_t >= task.change_step
        merged = jax.tree.map(lambda a, b: jnp.where(due, a, b), fresh, task)
        return merged.replace(recovery_counter=task.recovery_counter)

    def task_obs(self, task: GetupTask, phys, kin):
        return task.tar_height[None]

    def reward(self, task: GetupTask, phys, kin, action):
        diff = task.tar_height - kin.xpos[0, 2]
        return jnp.exp(-4.0 * diff * diff)

    def task_termination(self, task: GetupTask, terminated):
        recovering = task.recovery_counter > 0
        task = task.replace(
            recovery_counter=jnp.maximum(task.recovery_counter - 1, 0)
        )
        return task, terminated & ~recovering


# =========================================================================
# Reach
# =========================================================================


@dataclasses.dataclass(frozen=True)
class ReachConfig(EnvConfig):
    """data/cfg/env/reach.yaml"""

    reach_body_name: str = "R_Hand"
    tar_dist_max: float = 1.0
    tar_height_min: float = 0.2
    tar_height_max: float = 2.0
    tar_change_steps_min: int = 50
    tar_change_steps_max: int = 100


class ReachTask(struct.PyTreeNode):
    tar_pos: jax.Array       # (3,) world target
    change_step: jax.Array   # () int32


class HumanoidReach(HumanoidEnv):
    """Reach a random 3-D point with one body (tasks/humanoid_reach.py):
    reward = exp(-4 ||p_body - p*||^2); obs = heading-local target pos (3)."""

    def __init__(self, model, config: ReachConfig | None = None):
        super().__init__(model, config or ReachConfig())
        self._reach_body = model.body_names.index(self.config.reach_body_name)

    @property
    def task_obs_size(self) -> int:
        return 3

    def init_task(self, key):
        dtype = self.model.qpos0.dtype
        return ReachTask(
            tar_pos=jnp.zeros((3,), dtype),
            change_step=jnp.zeros((), jnp.int32),
        )

    def _sample(self, key, task: ReachTask, cur_t):
        cfg: ReachConfig = self.config
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (3,), task.tar_pos.dtype)
        xy = cfg.tar_dist_max * (2.0 * u[:2] - 1.0)
        z = (cfg.tar_height_max - cfg.tar_height_min) * u[2] + cfg.tar_height_min
        steps = jax.random.randint(
            k2, (), cfg.tar_change_steps_min, cfg.tar_change_steps_max
        )
        return task.replace(
            tar_pos=jnp.concatenate([xy, z[None]]), change_step=cur_t + steps
        )

    def reset_task(self, key, task, cur_t):
        return self._sample(key, task, cur_t)

    def update_task(self, key, task: ReachTask, cur_t):
        fresh = self._sample(key, task, cur_t)
        due = cur_t >= task.change_step
        return jax.tree.map(lambda a, b: jnp.where(due, a, b), fresh, task)

    def task_obs(self, task: ReachTask, phys, kin):
        heading_inv = _heading_inv(
            phys.qpos[3:7], self.upright_start, self.model.humanoid_type
        )
        local = T.quat_rotate(heading_inv, task.tar_pos - phys.qpos[0:3])
        return local

    def reward(self, task: ReachTask, phys, kin, action):
        diff = task.tar_pos - kin.xpos[self._reach_body]
        return jnp.exp(-4.0 * jnp.sum(diff * diff))


TASKS = {
    "HumanoidEnv": HumanoidEnv,
    "HumanoidSpeed": HumanoidSpeed,
    "HumanoidGetup": HumanoidGetup,
    "HumanoidReach": HumanoidReach,
}
