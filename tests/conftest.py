"""Test configuration: run on CPU with 8 virtual devices and float64 enabled.

TPU compile latency makes per-test TPU runs impractical; the CPU backend with
x64 lets parity tests separate algorithmic error from float32 rounding. The
8 virtual devices stand in for a TPU mesh in sharding tests (the standard JAX
fake-cluster trick; the reference has no distributed backend to mirror, see
SURVEY.md §2.10).
"""
import os

# The container boot forces JAX_PLATFORMS=axon (remote TPU tunnel); tests must
# run locally. The sitecustomize hook registers the axon backend before this
# file runs, so override via jax.config (backends initialize lazily).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REFERENCE_XML = "/root/reference/smpl_sim/data/assets/mjcf/smpl_humanoid.xml"
