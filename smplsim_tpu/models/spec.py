"""RobotModel: the TPU-native replacement for the reference's MJCF-string robot.

The reference builds humanoids as MuJoCo XML strings
(smpl_sim/smpllib/smpl_local_robot.py:1280-1505) which the C engine compiles.
Here the robot IS a pytree of arrays: every numeric field is a traced JAX
array (so a batch of differently-shaped humanoids is just a vmapped model),
while topology (parents, joint layout, geom types) is static Python metadata
that unrolls at trace time.

Kinematic convention (matches the generated SMPL MJCF):
  * body 0 (Pelvis) has a free joint: qpos[0:3] world translation,
    qpos[3:7] wxyz quaternion; qvel[0:3] world linear velocity,
    qvel[3:6] body-frame angular velocity (MuJoCo free-joint layout).
  * every other body b has 3 stacked hinge joints about body-local x,y,z
    applied intrinsically: R_local(b) = Rx(qx) @ Ry(qy) @ Rz(qz)
    (reference skeleton_local.py:469-511 writes exactly this joint stack).
  * nq = 7 + 3*(J-1), nv = 6 + 3*(J-1), nu = 3*(J-1).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# geom type codes (static)
GEOM_SPHERE = 0
GEOM_CAPSULE = 1
GEOM_BOX = 2

_GEOM_TYPE_NAMES = {GEOM_SPHERE: "sphere", GEOM_CAPSULE: "capsule", GEOM_BOX: "box"}


class RobotModel(struct.PyTreeNode):
    """Batched-friendly physics model of one humanoid morphology.

    Array fields may carry a leading batch dim (vmapped shape variation);
    static fields define topology shared across the batch.
    """

    # ---- kinematic tree (arrays) ----
    body_pos: jax.Array      # (J,3) body frame origin offset in parent frame
    body_quat: jax.Array     # (J,4) body frame rotation in parent frame (wxyz)

    # ---- inertial (arrays, derived from geoms at build time) ----
    body_mass: jax.Array     # (J,)
    body_ipos: jax.Array     # (J,3) COM in body frame
    body_inertia: jax.Array  # (J,3,3) rotational inertia about COM, body frame

    # ---- joints / dofs (arrays) ----
    jnt_range: jax.Array     # (nu,2) hinge limits [lo,hi] radians
    armature: jax.Array      # (nv,) added rotor inertia per dof
    dof_damping: jax.Array   # (nv,)

    # ---- actuation & PD gains (arrays) ----
    gear: jax.Array          # (nu,) motor gear
    jkp: jax.Array           # (nu,) stable-PD kp
    jkd: jax.Array           # (nu,) stable-PD kd
    torque_lim: jax.Array    # (nu,)
    pd_action_scale: jax.Array   # (nu,)
    pd_action_offset: jax.Array  # (nu,)

    # ---- geoms (arrays) ----
    geom_pos: jax.Array      # (G,3) geom origin in body frame
    geom_quat: jax.Array     # (G,4)
    geom_size: jax.Array     # (G,3) sphere:(r,-,-) capsule:(r,hl,-) box:(hx,hy,hz)
    geom_friction: jax.Array  # (G,3) sliding, torsional, rolling
    geom_margin: jax.Array   # (G,)
    geom_solref: jax.Array   # (G,2)
    geom_solimp: jax.Array   # (G,5)

    # ---- contact options (arrays) ----
    floor_friction: jax.Array  # (3,)
    floor_margin: jax.Array    # ()
    floor_solref: jax.Array    # (2,)
    floor_solimp: jax.Array    # (5,)

    # ---- world options (arrays) ----
    gravity: jax.Array       # (3,)
    timestep: jax.Array      # ()

    # ---- reference state & solver weights (arrays) ----
    qpos0: jax.Array            # (nq,) default configuration
    dof_invweight0: jax.Array   # (nv,) diag(M^-1) at qpos0 (limit-row R)
    body_invweight0: jax.Array  # (J,2) trans/rot inverse weight (contact R)

    # ---- static topology ----
    parents: Tuple[int, ...] = struct.field(pytree_node=False)
    body_names: Tuple[str, ...] = struct.field(pytree_node=False)
    geom_body: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_type: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_names: Tuple[str, ...] = struct.field(pytree_node=False)
    # default limit activation per hinge dof (True => limited joint)
    jnt_limited: Tuple[bool, ...] = struct.field(pytree_node=False)
    # collision filtering (static)
    geom_contype: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    geom_conaffinity: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # excluded body pairs (MJCF <contact><exclude>), body indices
    contact_excludes: Tuple[Tuple[int, int], ...] = struct.field(
        pytree_node=False, default=()
    )
    # bodies allowed to touch the floor without triggering termination
    humanoid_type: str = struct.field(pytree_node=False, default="smpl")

    # ------------------------------------------------------------------
    @property
    def nbody(self) -> int:
        return len(self.parents)

    @property
    def nu(self) -> int:
        return 3 * (self.nbody - 1)

    @property
    def nv(self) -> int:
        return 6 + self.nu

    @property
    def nq(self) -> int:
        return 7 + self.nu

    @property
    def ngeom(self) -> int:
        return len(self.geom_type)

    def dof_body(self) -> np.ndarray:
        """(nv,) body index owning each dof (free root owns first 6)."""
        out = [0] * 6
        for b in range(1, self.nbody):
            out += [b, b, b]
        return np.asarray(out, dtype=np.int32)

    def body_dof_start(self, b: int) -> int:
        """First dof index of body b's hinge triple (b >= 1)."""
        return 6 + 3 * (b - 1)

    def astype(self, dtype) -> "RobotModel":
        return jax.tree.map(lambda x: jnp.asarray(x, dtype=dtype), self)


def stack_models(models: list["RobotModel"]) -> "RobotModel":
    """Stack N same-topology RobotModels into one batched pytree.

    The TPU-native equivalent of the reference's per-env β-sampled robots
    (smpl_sim/envs/nv/humanoid.py:1197-1229, 1298-1343 builds a different
    MJCF per env from sampled AMASS betas): every array leaf gains a leading
    (N,) axis, static topology (parents, geom types, names...) must be
    identical across inputs and is kept once. The result feeds the envs'
    `model=` override under vmap:

        batched = stack_models([build_robot_model(p, b)[0] for b in betas])
        states = jax.vmap(lambda k, m: env.reset(k, model=m))(keys, batched)
        states = jax.vmap(lambda s, a, m: env.step_autoreset(s, a, model=m))(
            states, actions, batched)
    """
    if not models:
        raise ValueError("stack_models needs at least one model")
    base = models[0]
    static_fields = [
        f.name for f in dataclasses.fields(base)
        if not f.metadata.get("pytree_node", True)
    ]
    for i, m in enumerate(models[1:], 1):
        for name in static_fields:
            if getattr(m, name) != getattr(base, name):
                raise ValueError(
                    f"model {i} static field {name!r} differs from model 0 — "
                    "stack_models requires identical topology (same SMPL "
                    "family / RobotConfig; betas may differ)"
                )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *models)


# ---------------------------------------------------------------------------
# Inertia synthesis from geoms (replaces MuJoCo's compiler inertial pass)
# ---------------------------------------------------------------------------


def geom_mass_inertia(gtype: int, size: np.ndarray, density: float):
    """Mass and rotational inertia about the geom COM in the geom frame.

    Formulas match MuJoCo's compiler (user_objects.cc GetVolume/SetInertia):
    capsule = cylinder + two hemisphere caps offset along +-z.
    """
    if gtype == GEOM_SPHERE:
        r = float(size[0])
        m = density * 4.0 / 3.0 * np.pi * r**3
        i = 0.4 * m * r * r
        return m, np.diag([i, i, i])
    if gtype == GEOM_CAPSULE:
        r, hl = float(size[0]), float(size[1])
        m_cyl = density * np.pi * r * r * (2.0 * hl)
        m_sph = density * 4.0 / 3.0 * np.pi * r**3
        m = m_cyl + m_sph
        # axial (z)
        izz = 0.5 * m_cyl * r * r + 0.4 * m_sph * r * r
        # perpendicular: cylinder + two hemispheres (parallel axis, COM at
        # hl + 3r/8 from center; hemisphere inertia about own COM 83/320 m r^2)
        ixx = (
            m_cyl * (r * r / 4.0 + hl * hl / 3.0)
            + m_sph * (83.0 / 320.0 * r * r + (hl + 3.0 * r / 8.0) ** 2)
        )
        return m, np.diag([ixx, ixx, izz])
    if gtype == GEOM_BOX:
        hx, hy, hz = float(size[0]), float(size[1]), float(size[2])
        m = density * 8.0 * hx * hy * hz
        return m, np.diag(
            [
                m * (hy * hy + hz * hz) / 3.0,
                m * (hx * hx + hz * hz) / 3.0,
                m * (hx * hx + hy * hy) / 3.0,
            ]
        )
    raise ValueError(f"unknown geom type {gtype}")


def body_inertial_from_geoms(
    geom_specs: list[dict[str, Any]],
) -> tuple[float, np.ndarray, np.ndarray]:
    """Aggregate body mass, COM (body frame) and inertia about COM from geoms.

    geom_specs: list of dicts with keys type,size,pos,quat,density.
    """
    masses, coms, inertias = [], [], []
    for g in geom_specs:
        m, I_geom = geom_mass_inertia(g["type"], g["size"], g["density"])
        R = _quat_to_matrix_np(np.asarray(g["quat"], dtype=np.float64))
        I_body = R @ I_geom @ R.T
        masses.append(m)
        coms.append(np.asarray(g["pos"], dtype=np.float64))
        inertias.append(I_body)
    m_tot = float(sum(masses))
    com = sum(m * c for m, c in zip(masses, coms)) / m_tot
    I_tot = np.zeros((3, 3))
    for m, c, I in zip(masses, coms, inertias):
        d = c - com
        I_tot += I + m * ((d @ d) * np.eye(3) - np.outer(d, d))
    return m_tot, com, I_tot


def _quat_to_matrix_np(q: np.ndarray) -> np.ndarray:
    """wxyz quat -> rotation matrix in float64 numpy (build-time host path)."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_z_to_vec(v: np.ndarray) -> np.ndarray:
    """wxyz quaternion rotating +z onto direction v (numpy, build-time)."""
    v = np.asarray(v, dtype=np.float64)
    n = np.linalg.norm(v)
    if n < 1e-12:
        return np.array([1.0, 0, 0, 0])
    v = v / n
    z = np.array([0.0, 0.0, 1.0])
    c = float(np.dot(z, v))
    if c > 1.0 - 1e-12:
        return np.array([1.0, 0, 0, 0])
    if c < -1.0 + 1e-12:
        return np.array([0.0, 1.0, 0, 0])  # 180 deg about x
    axis = np.cross(z, v)
    s = np.linalg.norm(axis)
    axis = axis / s
    half = np.arctan2(s, c) / 2.0
    return np.array([np.cos(half), *(np.sin(half) * axis)])
