"""Isaac-Gym-path humanoid: max-coords observations, obs history stacking,
freeze masks, per-body termination heights, reward ≡ 1.

TPU-native rebuild of the reference's GPU-vectorized env
(smpl_sim/envs/nv/humanoid.py). The reference allocates PhysX device-tensor
views and steps 1536+ actors in one CUDA sim; here the same batch semantics
come from `jax.vmap` over the pure-functional engine, so there is no separate
"vectorized backend" — NvHumanoid is a per-env pure function like every other
env in this package.

Observation parity:
  * compute_obs_max       == compute_humanoid_observations_smpl_max
                             (nv/humanoid.py:2605-2702)
  * compute_obs_max_v2    == compute_humanoid_observations_smpl_max_v2
                             (nv/humanoid.py:2705-2788), the time-stacked
                             variant fed by the rigid-body history buffers
                             (_init/_update_tensor_history, :2087-2125)
  * dof_to_obs_smpl       == dof_to_obs_smpl (nv/humanoid.py:2262-2273)
  * compute_obs_reduced   == compute_humanoid_observations_smpl
                             (nv/humanoid.py:2530-2602)

Control parity: freeze_hand / freeze_toe / remove_neck zero the PD target of
the masked joints (pre_physics_step, nv/humanoid.py:2042-2073).

Termination parity: fall = (non-contact-body touches floor) AND (any
non-contact body below its termination height), gated on progress > 1
(compute_humanoid_reset, nv/humanoid.py:2468-2516; per-body heights from
_build_termination_heights, :1169-1194 — head raised to 0.3).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from smplsim_tpu import transforms as T
from smplsim_tpu.envs.base import EnvConfig, EnvState, HumanoidEnv
from smplsim_tpu.models.spec import RobotModel
from smplsim_tpu.physics import engine, kinematics, solver
from smplsim_tpu.physics.engine import PhysicsState


# ---------------------------------------------------------------------------
# observation functions (single env; vmap for batches)
# ---------------------------------------------------------------------------
def dof_to_obs_smpl(dof_pos: jax.Array) -> jax.Array:
    """(J*3,) exp-map dof angles -> (J*6,) tan-norm joint obs
    (nv/humanoid.py:2262-2273)."""
    q = T.exp_map_to_quat(dof_pos.reshape(-1, 3))
    return T.quat_to_tan_norm(q).reshape(-1)


def compute_obs_max(
    body_pos: jax.Array,      # (J,3)
    body_rot: jax.Array,      # (J,4) wxyz
    body_vel: jax.Array,      # (J,3)
    body_ang_vel: jax.Array,  # (J,3)
    smpl_params: jax.Array | None = None,
    limb_weight_params: jax.Array | None = None,
    local_root_obs: bool = True,
    root_height_obs: bool = True,
    upright: bool = True,
    humanoid_type: str = "smpl",
) -> jax.Array:
    """Heading-local max-coords obs (nv/humanoid.py:2605-2702).

    Layout: [root_h?] local_body_pos[1:] (J-1)*3 | tan-norm rots J*6 |
    local vels J*3 | local ang vels J*3 | smpl_params? | limb_weights?.
    """
    J = body_pos.shape[0]
    root_pos = body_pos[0]
    root_rot = body_rot[0]
    if not upright:
        root_rot = T.remove_base_rot(root_rot, humanoid_type)
    heading_inv = T.calc_heading_quat_inv(root_rot)
    h = jnp.broadcast_to(heading_inv, (J, 4))

    local_body_pos = T.quat_rotate(h, body_pos - root_pos)
    local_body_rot = T.quat_mul(h, body_rot)
    rot_obs = T.quat_to_tan_norm(local_body_rot)
    if not local_root_obs:
        # non-local root obs overrides the first 6 entries with the raw
        # (base-rot-removed) root rotation (nv/humanoid.py:2664-2668)
        rot_obs = rot_obs.at[0].set(T.quat_to_tan_norm(root_rot))

    parts = []
    if root_height_obs:
        parts.append(root_pos[2:3])
    parts += [
        local_body_pos[1:].reshape(-1),
        rot_obs.reshape(-1),
        T.quat_rotate(h, body_vel).reshape(-1),
        T.quat_rotate(h, body_ang_vel).reshape(-1),
    ]
    if smpl_params is not None:
        parts.append(smpl_params)
    if limb_weight_params is not None:
        parts.append(limb_weight_params)
    return jnp.concatenate(parts)


def compute_obs_max_v2(
    body_pos: jax.Array,      # (Tsteps,J,3) history, oldest first
    body_rot: jax.Array,      # (Tsteps,J,4)
    body_vel: jax.Array,      # (Tsteps,J,3)
    body_ang_vel: jax.Array,  # (Tsteps,J,3)
    local_root_obs: bool = True,
    root_height_obs: bool = True,
    upright: bool = True,
    humanoid_type: str = "smpl",
) -> jax.Array:
    """Time-stacked max-coords obs (nv/humanoid.py:2705-2788): every history
    frame is expressed in the CURRENT (latest) heading frame relative to the
    current root position; per-frame root height is prepended when enabled."""
    Tn, J = body_pos.shape[0], body_pos.shape[1]
    root_pos = body_pos[-1, 0]
    root_rot = body_rot[-1, 0]
    if not upright:
        root_rot = T.remove_base_rot(root_rot, humanoid_type)
    heading_inv = T.calc_heading_quat_inv(root_rot)
    h = jnp.broadcast_to(heading_inv, (Tn, J, 4))

    local_body_pos = T.quat_rotate(h, body_pos - root_pos)  # (T,J,3)
    local_body_pos = local_body_pos.reshape(Tn, -1)[:, 3:]  # drop root pos
    rot_obs = T.quat_to_tan_norm(T.quat_mul(h, body_rot))   # (T,J,6)
    if not local_root_obs:
        raw = T.quat_to_tan_norm(body_rot[:, 0])             # (T,6)
        rot_obs = rot_obs.at[:, 0].set(raw)
    frame_obs = [
        local_body_pos,
        rot_obs.reshape(Tn, -1),
        T.quat_rotate(h, body_vel).reshape(Tn, -1),
        T.quat_rotate(h, body_ang_vel).reshape(Tn, -1),
    ]
    body_obs = jnp.concatenate(frame_obs, axis=-1)
    if root_height_obs:
        body_obs = jnp.concatenate([body_pos[:, 0, 2:3], body_obs], axis=-1)
    return body_obs.reshape(-1)


def compute_obs_reduced(
    root_pos: jax.Array,
    root_rot: jax.Array,
    root_vel: jax.Array,
    root_ang_vel: jax.Array,
    dof_pos: jax.Array,
    dof_vel: jax.Array,
    key_body_pos: jax.Array,   # (K,3)
    smpl_params: jax.Array | None = None,
    local_root_obs: bool = True,
    root_height_obs: bool = True,
    upright: bool = True,
    humanoid_type: str = "smpl",
) -> jax.Array:
    """Reduced-coords obs (nv/humanoid.py:2530-2602): root height/rot/vels +
    per-joint 6D dof obs + dof velocities + heading-local key-body positions."""
    if not upright:
        root_rot = T.remove_base_rot(root_rot, humanoid_type)
    heading_inv = T.calc_heading_quat_inv(root_rot)

    root_rot_obs = T.quat_to_tan_norm(
        T.quat_mul(heading_inv, root_rot) if local_root_obs else root_rot
    )
    K = key_body_pos.shape[0]
    h = jnp.broadcast_to(heading_inv, (K, 4))
    local_key = T.quat_rotate(h, key_body_pos - root_pos)

    parts = []
    if root_height_obs:
        parts.append(root_pos[2:3])
    parts += [
        root_rot_obs,
        T.quat_rotate(heading_inv, root_vel),
        T.quat_rotate(heading_inv, root_ang_vel),
        dof_to_obs_smpl(dof_pos),
        dof_vel,
        local_key.reshape(-1),
    ]
    if smpl_params is not None:
        parts.append(smpl_params)
    return jnp.concatenate(parts)


def obs_max_size(nbody: int, root_height_obs: bool = True) -> int:
    return (1 if root_height_obs else 0) + (nbody - 1) * 3 + nbody * (6 + 3 + 3)


def obs_max_v2_size(nbody: int, time_steps: int, root_height_obs: bool = True) -> int:
    per = (1 if root_height_obs else 0) + (nbody - 1) * 3 + nbody * (6 + 3 + 3)
    return per * time_steps


# ---------------------------------------------------------------------------
# rigid-body history (nv/humanoid.py:2087-2125)
# ---------------------------------------------------------------------------
class BodyHistory(struct.PyTreeNode):
    """Rolling (T,J,·) window of body kinematics, oldest first."""

    pos: jax.Array       # (T,J,3)
    rot: jax.Array       # (T,J,4)
    vel: jax.Array       # (T,J,3)
    ang_vel: jax.Array   # (T,J,3)

    @staticmethod
    def init(pos, rot, vel, ang_vel, time_steps: int) -> "BodyHistory":
        """Fill the whole window with the current frame (_init_tensor_history)."""
        rep = lambda x: jnp.broadcast_to(x, (time_steps,) + x.shape)
        return BodyHistory(pos=rep(pos), rot=rep(rot), vel=rep(vel),
                           ang_vel=rep(ang_vel))

    def push(self, pos, rot, vel, ang_vel) -> "BodyHistory":
        """Shift out the oldest frame, append the new one (_update_tensor_history)."""
        sh = lambda buf, x: jnp.concatenate([buf[1:], x[None]], axis=0)
        return BodyHistory(
            pos=sh(self.pos, pos), rot=sh(self.rot, rot),
            vel=sh(self.vel, vel), ang_vel=sh(self.ang_vel, ang_vel),
        )


# ---------------------------------------------------------------------------
# the env
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class NvConfig(EnvConfig):
    """Isaac-path knobs (nv/data/cfg/*.yaml + load_smpl_configs)."""

    obs_v: int = 1                   # 1: max-coords; 2: time-stacked (v7 in ref)
    past_track_steps: int = 5        # history length for obs_v=2
    local_root_obs: bool = True
    termination_height: float = 0.15
    head_termination_height: float = 0.3
    freeze_hand: bool = False
    freeze_toe: bool = False
    remove_neck: bool = False
    contact_bodies: Tuple[str, ...] = ("R_Ankle", "L_Ankle", "R_Toe", "L_Toe")
    # impulse perturbations: every perturb_interval control steps, a random
    # body receives a random horizontal+up force of magnitude up to
    # perturb_force for one control step — the cheap fault-injection hook
    # (the reference's projectile assets, nv/humanoid.py:80-190, without
    # simulating the projectiles themselves)
    perturb_interval: int = 0        # 0 disables
    perturb_force: float = 200.0     # Newtons, peak magnitude
    # SIMULATED free projectile spheres (r5): every proj_interval control
    # steps each sphere is re-thrown from a random direction proj_distance
    # away at root height toward the humanoid at ~proj_speed. Spheres fly
    # ballistically, couple to the humanoid through real EFC contact rows,
    # and receive the equal-and-opposite contact force (the full simulated
    # version of the reference's _load_proj_asset / projectile relaunch,
    # nv/humanoid.py:135-190, 1989-2020)
    num_projectiles: int = 0         # 0 disables
    proj_interval: int = 60          # control steps between throws
    proj_speed: float = 12.0         # m/s throw speed
    proj_radius: float = 0.10
    proj_mass: float = 2.0
    proj_distance: float = 2.0       # throw origin distance from the root


class NvHumanoid(HumanoidEnv):
    """The reference `Humanoid` task: reward 1, stay-alive termination.

    Extra EnvState.task payload: the BodyHistory window when obs_v=2.
    """

    def __init__(self, model: RobotModel, config: NvConfig | None = None):
        cfg = config or NvConfig()
        super().__init__(model, cfg)
        names = list(model.body_names)
        self._contact_body_ids = np.asarray(
            [names.index(n) for n in cfg.contact_bodies], dtype=np.int32
        )
        heights = np.full(model.nbody, cfg.termination_height, dtype=np.float64)
        if "Head" in names:
            heights[names.index("Head")] = max(
                cfg.head_termination_height, cfg.termination_height
            )
        heights[self._contact_body_ids] = -np.inf  # feet never trip the check
        self._termination_heights = heights
        self._pd_mask = self._build_pd_mask(cfg, names)

    @staticmethod
    def _build_pd_mask(cfg: NvConfig, body_names: list[str]) -> np.ndarray | None:
        frozen: list[str] = []
        if cfg.freeze_hand:
            frozen += ["L_Hand", "R_Hand"]
        if cfg.freeze_toe:
            frozen += ["L_Toe", "R_Toe"]
        if cfg.remove_neck:
            frozen += ["Neck", "Head"]
        if not frozen:
            return None
        mask = np.ones(3 * (len(body_names) - 1))
        for n in frozen:
            if n in body_names:
                d = (body_names.index(n) - 1) * 3
                mask[d:d + 3] = 0.0
        return mask

    # ------------- obs -------------
    @property
    def self_obs_size(self) -> int:
        cfg: NvConfig = self.config  # type: ignore[assignment]
        if cfg.obs_v == 1:
            return obs_max_size(self.model.nbody, cfg.root_height_obs)
        return obs_max_v2_size(
            self.model.nbody, cfg.past_track_steps + 1, cfg.root_height_obs
        )

    def _kin_tuple(self, phys: PhysicsState, kin: kinematics.Kin,
                   model: RobotModel | None = None):
        model = self.model if model is None else model
        rot = kinematics.body_quats(model, phys.qpos)
        vel, ang = kinematics.body_velocities(model, kin, phys.qvel)
        return kin.xpos, rot, vel, ang

    def compute_obs(self, task: Any, phys: PhysicsState, kin: kinematics.Kin,
                    model: RobotModel | None = None):
        cfg: NvConfig = self.config  # type: ignore[assignment]
        pos, rot, vel, ang = self._kin_tuple(phys, kin, model)
        if cfg.obs_v == 1:
            return compute_obs_max(
                pos, rot, vel, ang,
                local_root_obs=cfg.local_root_obs,
                root_height_obs=cfg.root_height_obs,
                upright=self.upright_start,
                humanoid_type=self.model.humanoid_type,
            )
        hist: BodyHistory = task
        hist = hist.push(pos, rot, vel, ang)
        return compute_obs_max_v2(
            hist.pos, hist.rot, hist.vel, hist.ang_vel,
            local_root_obs=cfg.local_root_obs,
            root_height_obs=cfg.root_height_obs,
            upright=self.upright_start,
            humanoid_type=self.model.humanoid_type,
        )

    # ------------- task hooks -------------
    def init_task(self, key: jax.Array) -> Any:
        cfg: NvConfig = self.config  # type: ignore[assignment]
        if cfg.obs_v != 2:
            return None
        # placeholder; reset() below re-primes from the actual init pose
        J = self.model.nbody
        z3 = jnp.zeros((J, 3))
        q = jnp.zeros((J, 4)).at[:, 0].set(1.0)
        return BodyHistory.init(z3, q, z3, z3, cfg.past_track_steps + 1)

    def reward(self, task, phys, kin, action) -> jax.Array:
        return jnp.ones((), phys.qpos.dtype)

    def pd_target_mask(self) -> jax.Array | None:
        return None if self._pd_mask is None else jnp.asarray(self._pd_mask)

    # ------------- overrides -------------
    def reset(self, key: jax.Array, model: RobotModel | None = None) -> EnvState:
        state = super().reset(key, model)
        cfg: NvConfig = self.config  # type: ignore[assignment]
        if cfg.obs_v == 2:
            m = self.model if model is None else model
            kin = kinematics.fk(m, state.phys.qpos)
            pos, rot, vel, ang = self._kin_tuple(state.phys, kin, model)
            hist = BodyHistory.init(pos, rot, vel, ang, cfg.past_track_steps + 1)
            state = state.replace(task=hist, obs=self.compute_obs_from_hist(hist))
        if cfg.num_projectiles > 0:
            dtype = state.phys.qpos.dtype
            P = cfg.num_projectiles
            # parked far away and at rest until the first scheduled throw
            pos = jnp.tile(jnp.asarray([100.0, 0.0, cfg.proj_radius], dtype),
                           (P, 1)) + jnp.arange(P, dtype=dtype)[:, None]
            state = state.replace(proj=(pos, jnp.zeros((P, 3), dtype)))
        return state

    def _throw(self, key: jax.Array, root_pos: jax.Array, cur_t, proj):
        """Projectile relaunch scheduler (reference nv/humanoid.py:1989-2020):
        every proj_interval steps re-throw each sphere from a random bearing
        proj_distance away, aimed at the root with an upward arc."""
        cfg: NvConfig = self.config  # type: ignore[assignment]
        pos, vel = proj
        dtype = pos.dtype
        P = pos.shape[0]
        k_ang, k_h, k_sp = jax.random.split(key, 3)
        ang = jax.random.uniform(k_ang, (P,), dtype, 0.0, 2 * jnp.pi)
        h = jax.random.uniform(k_h, (P,), dtype, 0.6, 1.4)
        speed = cfg.proj_speed * jax.random.uniform(k_sp, (P,), dtype, 0.7, 1.0)
        origin = jnp.stack([
            root_pos[0] + cfg.proj_distance * jnp.cos(ang),
            root_pos[1] + cfg.proj_distance * jnp.sin(ang),
            h,
        ], axis=1)
        target = jnp.stack([root_pos[0], root_pos[1],
                            jnp.clip(root_pos[2], 0.4, 1.2)])
        d = target[None, :] - origin
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=1, keepdims=True), 1e-6)
        v_new = d * speed[:, None]
        active = (cur_t % cfg.proj_interval) == 0
        return (jnp.where(active, origin, pos),
                jnp.where(active, v_new, vel))

    def compute_obs_from_hist(self, hist: BodyHistory) -> jax.Array:
        cfg: NvConfig = self.config  # type: ignore[assignment]
        return compute_obs_max_v2(
            hist.pos, hist.rot, hist.vel, hist.ang_vel,
            local_root_obs=cfg.local_root_obs,
            root_height_obs=cfg.root_height_obs,
            upright=self.upright_start,
            humanoid_type=self.model.humanoid_type,
        )

    def step(self, state: EnvState, action: jax.Array,
             model: RobotModel | None = None) -> EnvState:
        cfg = self.config
        model = self.model if model is None else model
        cfg_nv: NvConfig = cfg  # type: ignore[assignment]
        action = jnp.asarray(action, state.phys.qpos.dtype)
        if cfg.clip_actions:
            action = jnp.clip(action, -1.0, 1.0)
        k_task, k_next = jax.random.split(state.rng)

        ext_force = None
        if cfg_nv.perturb_interval > 0:
            k_body, k_dir, k_mag = jax.random.split(k_task, 3)
            active = (state.cur_t % cfg_nv.perturb_interval) == 0
            body = jax.random.randint(k_body, (), 0, model.nbody)
            d = jax.random.normal(k_dir, (3,), state.phys.qpos.dtype)
            d = d.at[2].set(jnp.abs(d[2]))  # upward bias like thrown objects
            d = d / jnp.maximum(jnp.linalg.norm(d), 1e-6)
            mag = jax.random.uniform(
                k_mag, (), state.phys.qpos.dtype, 0.0, cfg_nv.perturb_force
            )
            ext_force = jnp.where(
                active,
                jax.nn.one_hot(body, model.nbody,
                               dtype=state.phys.qpos.dtype)[:, None] * (mag * d),
                jnp.zeros((model.nbody, 3), state.phys.qpos.dtype),
            )

        proj_in = None
        proj_out = None
        if cfg_nv.num_projectiles > 0 and state.proj is not None:
            k_throw, k_task = jax.random.split(k_task)
            p_pos, p_vel = self._throw(
                k_throw, state.phys.qpos[:3], state.cur_t, state.proj)
            dtype = state.phys.qpos.dtype
            P = cfg_nv.num_projectiles
            proj_in = (p_pos, p_vel,
                       jnp.full((P,), cfg_nv.proj_radius, dtype),
                       jnp.full((P,), 1.0 / cfg_nv.proj_mass, dtype))

        outs = engine.control_step(
            model, state.phys, action,
            control_freq_inv=cfg.control_frequency_inv,
            control_mode=cfg.control_mode,
            power_scale=cfg.power_scale,
            cache=state.pd_cache,
            pd_target_mask=self.pd_target_mask(),
            reset_ref=self._reset_ref if model is self.model else None,
            ext_force=ext_force,
            proj=proj_in,
        )
        if proj_in is not None:
            phys, info_last, power, cache, proj_out = outs
        else:
            phys, info_last, power, cache = outs

        cur_t = state.cur_t + 1
        kin = kinematics.fk(model, phys.qpos)
        pos, rot, vel, ang = self._kin_tuple(phys, kin, model)

        task = state.task
        if cfg_nv.obs_v == 2:
            task = task.push(pos, rot, vel, ang)
            obs = self.compute_obs_from_hist(task)
        else:
            obs = compute_obs_max(
                pos, rot, vel, ang,
                local_root_obs=cfg_nv.local_root_obs,
                root_height_obs=cfg.root_height_obs,
                upright=self.upright_start,
                humanoid_type=model.humanoid_type,
            )
        rew = jnp.ones((), phys.qpos.dtype)

        # nv reset semantics (compute_humanoid_reset, nv/humanoid.py:2468-2516)
        truncated = cur_t >= cfg.episode_length - 1
        body_contact = (
            jnp.zeros(model.nbody, dtype=bool)
            .at[jnp.asarray(tuple(model.geom_body))]
            .max(info_last.geom_floor_contact)
        )
        body_contact = body_contact.at[self._contact_body_ids].set(False)
        fall_contact = jnp.any(body_contact)
        fall_height = jnp.any(
            kin.xpos[:, 2] < jnp.asarray(self._termination_heights, kin.xpos.dtype)
        )
        has_fallen = fall_contact & fall_height & (cur_t > 1)
        terminated = has_fallen & bool(cfg.enable_early_termination)

        return EnvState(
            phys=phys, obs=obs, reward=rew,
            terminated=terminated, truncated=truncated,
            cur_t=cur_t, rng=k_next, task=task,
            info={"power": power, "nactive": info_last.nactive_max,
                  "overflow": info_last.nactive_max > solver.COMPACT_ROWS,
                  "stalled": info_last.stalled_any},
            pd_cache=cache, kin=kin, proj=proj_out,
        )
