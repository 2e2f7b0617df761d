"""Design-parameter space over RobotModel pytrees.

TPU-native redesign of the reference's XML-re-parsing param objects
(smpl_sim/smpllib/smpl_local_robot.py:322-1162: Joint/Geom/Actuator/Body
classes with get_params/set_params normalized to [-1, 1], used by the
parent projects' design-search loops). Instead of mutating an lxml tree and
re-compiling MuJoCo, the design space here is a pair of PURE functions over
the RobotModel pytree:

    space = DesignSpace(model, spec)
    vec   = space.flatten(model)          # (D,) in [-1, 1]
    model2 = space.unflatten(model, vec)  # updated RobotModel, jittable

Because unflatten is differentiable and jit/vmap-compatible, design search
can run ON DEVICE (e.g. CEM over morphologies with vmapped design vectors,
or gradient-based co-design through the physics engine) — a capability the
reference's string-rewriting pipeline cannot offer.

Parameter groups mirror the reference's tunables:
  * joint: damping, armature, stiffness-free (our models carry none)
  * actuator: gear
  * gains: jkp, jkd (the reference tunes these through its Actuator class)
  * geom: size scale (per-geom multiplicative, preserving shape class)
  * body: offset (additive bone-vector perturbation, reference Body
    "offset" / "bone_len" params)
Log-scaled ranges (reference "log" param type) are used for the
multiplicative quantities (damping, armature, gear, gains, size scale).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smplsim_tpu.models.spec import RobotModel


def normalize_range(value, lb, ub):
    """value in [lb, ub] -> [-1, 1] (smpl_local_robot.py:49)."""
    return (value - lb) / (ub - lb) * 2.0 - 1.0


def denormalize_range(value, lb, ub):
    """value in [-1, 1] -> [lb, ub] (smpl_local_robot.py:53)."""
    return (value + 1.0) * 0.5 * (ub - lb) + lb


# default spec: {group: {param: {"lb": float, "ub": float, "log": bool}}}
# ranges follow the reference yaml conventions (relative multiplicative
# ranges for log params, absolute metres for offsets)
DEFAULT_SPEC: Dict[str, Dict[str, Dict[str, Any]]] = {
    "joint": {
        "damping": {"lb": 0.2, "ub": 5.0, "log": True},
        "armature": {"lb": 0.2, "ub": 5.0, "log": True},
    },
    "actuator": {
        "gear": {"lb": 0.2, "ub": 5.0, "log": True},
    },
    "gains": {
        "jkp": {"lb": 0.25, "ub": 4.0, "log": True},
        "jkd": {"lb": 0.25, "ub": 4.0, "log": True},
    },
    "geom": {
        "size": {"lb": 0.7, "ub": 1.43, "log": True},
    },
    "body": {
        "offset": {"lb": -0.05, "ub": 0.05, "log": False},
    },
}

# (group, param) -> (RobotModel field, per-element shape kind)
_FIELDS: Dict[Tuple[str, str], Tuple[str, str]] = {
    ("joint", "damping"): ("dof_damping", "vector"),
    ("joint", "armature"): ("armature", "vector"),
    ("actuator", "gear"): ("gear", "vector"),
    ("gains", "jkp"): ("jkp", "vector"),
    ("gains", "jkd"): ("jkd", "vector"),
    ("geom", "size"): ("geom_size", "matrix"),
    ("body", "offset"): ("body_pos", "matrix"),
}


@dataclasses.dataclass(frozen=True)
class _Entry:
    group: str
    param: str
    field: str
    kind: str          # "vector" (multiplicative per element) or "matrix"
    log: bool
    lb: float
    ub: float
    size: int          # flattened length


class DesignSpace:
    """Flatten/unflatten a RobotModel's tunable parameters to [-1, 1]."""

    def __init__(self, model: RobotModel, spec=None):
        spec = DEFAULT_SPEC if spec is None else spec
        self._base = model
        self.entries = []
        for group, params in spec.items():
            for pname, ps in params.items():
                field, kind = _FIELDS[(group, pname)]
                arr = np.asarray(getattr(model, field))
                self.entries.append(_Entry(
                    group=group, param=pname, field=field, kind=kind,
                    log=bool(ps.get("log", False)),
                    lb=float(ps["lb"]), ub=float(ps["ub"]),
                    size=int(arr.size),
                ))
        self.dim = sum(e.size for e in self.entries)

    # ------------------------------------------------------------------
    def names(self):
        """Per-dimension names (reference get_params(get_name=True))."""
        out = []
        for e in self.entries:
            base = np.asarray(getattr(self._base, e.field))
            if base.ndim == 1:
                out += [f"{e.group}.{e.param}[{i}]" for i in range(base.shape[0])]
            else:
                out += [
                    f"{e.group}.{e.param}[{i},{j}]"
                    for i in range(base.shape[0]) for j in range(base.shape[1])
                ]
        return out

    def _ratio_to_norm(self, e: _Entry, ratio):
        if e.log:
            return normalize_range(
                jnp.log(ratio), np.log(e.lb), np.log(e.ub)
            )
        return normalize_range(ratio, e.lb, e.ub)

    def _norm_to_ratio(self, e: _Entry, v):
        if e.log:
            return jnp.exp(denormalize_range(v, np.log(e.lb), np.log(e.ub)))
        return denormalize_range(v, e.lb, e.ub)

    def flatten(self, model: RobotModel) -> jax.Array:
        """(D,) design vector in [-1, 1] describing `model` relative to the
        base model this space was built with."""
        parts = []
        for e in self.entries:
            base = jnp.asarray(getattr(self._base, e.field))
            cur = jnp.asarray(getattr(model, e.field))
            if e.group == "body" and e.param == "offset":
                delta = (cur - base).reshape(-1)
                parts.append(normalize_range(delta, e.lb, e.ub))
            else:
                ratio = (cur / jnp.where(base == 0, 1.0, base)).reshape(-1)
                ratio = jnp.where(jnp.asarray(base == 0).reshape(-1), 1.0, ratio)
                parts.append(self._ratio_to_norm(e, ratio))
        return jnp.clip(jnp.concatenate(parts), -1.0, 1.0)

    def unflatten(self, model: RobotModel | None, vec: jax.Array) -> RobotModel:
        """Materialize a (D,) design vector in [-1, 1] as a RobotModel.

        Design vectors are ABSOLUTE with respect to the base model this space
        was built with: every spec'd field is computed from `self._base` and
        the vector, so `unflatten(m, flatten(m2))` reproduces m2's spec'd
        fields regardless of m. `model` (defaults to the base) only supplies
        the NON-spec'd fields of the result — pass a model whose other
        arrays (e.g. domain-randomized friction) should be preserved.
        Pure and jittable.
        """
        if model is None:
            model = self._base
        updates = {}
        off = 0
        for e in self.entries:
            base = jnp.asarray(getattr(self._base, e.field))
            v = vec[off:off + e.size].reshape(base.shape)
            off += e.size
            if e.group == "body" and e.param == "offset":
                delta = denormalize_range(v, e.lb, e.ub)
                # the root body never moves (freejoint origin)
                delta = delta.at[0].set(0.0)
                updates[e.field] = base + delta.astype(base.dtype)
            else:
                ratio = self._norm_to_ratio(e, v)
                updates[e.field] = (base * ratio).astype(base.dtype)
        return model.replace(**updates)
