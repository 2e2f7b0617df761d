"""Bake the neutral-SMPL humanoid RobotModel asset from a SMPLSim-format MJCF.

Usage: python tools/bake_default_humanoid.py [path-to-mjcf]

Defaults to the reference's baked mean-neutral-body MJCF (the same asset its
HumanoidEnv falls back to when SMPL pkl data is missing). The output is a
numeric JSON pytree under smplsim_tpu/models/assets/ — data, not code — so the
TPU framework runs standalone.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from smplsim_tpu.models import mjcf, registry

DEFAULT_SRC = "/root/reference/smpl_sim/data/assets/mjcf/smpl_humanoid.xml"


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    model = mjcf.parse_mjcf_file(src, dtype=jnp.float64)
    # the SMPL humanoid runs at 450 Hz physics (reference base_env.yaml)
    model = model.replace(timestep=jnp.asarray(1.0 / 450.0, dtype=jnp.float64))
    out = os.path.join(
        os.path.dirname(__file__), "..", "smplsim_tpu", "models", "assets",
        "smpl_humanoid_neutral.json.gz",
    )
    registry.save_model(model, out)
    print(f"baked {model.nbody}-body humanoid -> {out}")


if __name__ == "__main__":
    main()
