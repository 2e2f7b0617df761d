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

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

# Parity tests validate against MuJoCo's every-pair collision pipeline; pin
# the product-rate broadphase keeps wide so no pair is ever culled. (The
# product operating point's tighter keeps are validated separately by the
# calibration/trajectory-envelope tooling, like SMPLSIM_QP_*.)
os.environ.setdefault("SMPLSIM_CC_KEEP", "4096")
os.environ.setdefault("SMPLSIM_CB_KEEP", "4096")
os.environ.setdefault("SMPLSIM_BB_KEEP", "4096")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the parity suite is compile-dominated (deep
# scans over the physics engine); caching compiled programs across pytest
# runs cuts repeat wall time several-fold
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

REFERENCE_XML = "/root/reference/smpl_sim/data/assets/mjcf/smpl_humanoid.xml"

# ---------------------------------------------------------------------------
# slow-test gating: closed-loop trajectory parity tests take minutes each
# (compile + hundreds of substeps vs real MuJoCo). The default run skips
# them so `pytest -q` stays fast for iteration; run everything with
#   pytest --runslow        (or -m slow for only the slow ones)
# CI/driver runs should use --runslow.
# ---------------------------------------------------------------------------
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run slow closed-loop parity tests (implies --runfull)",
    )
    parser.addoption(
        "--runfull", action="store_true", default=False,
        help="run the full compile-heavy tier (default is the smoke tier)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long closed-loop parity test (use --runslow)"
    )
    config.addinivalue_line(
        "markers", "full: compile-heavy tier test (use --runfull)"
    )


# Smoke tier: fast unit coverage of every subsystem — the default `pytest -q`
# finishes in ~40 s with a warm compile cache (measured r5; compile-heavy members are demoted with @pytest.mark.full). Everything else
# (engine/env/kernel parity suites, rollout and training integration — the
# compile-heavy tier) runs with --runfull; the multi-minute closed-loop
# trajectory gates additionally need --runslow. CI/driver validation runs
# should use `pytest --runslow` (which enables both tiers).
SMOKE_FILES = {
    "test_transforms.py",      # quaternion/rotation algebra vs scipy
    "test_model_parity.py",    # builder tables vs reference XML
    "test_converter.py",       # qpos converters
    "test_design.py",          # design-param space
    "test_native.py",          # C++ asset-prep bindings
    "test_mesh_builder.py",    # mesh skeleton writer
    "test_body_model.py",      # SMPL LBS
    "test_poselib.py",         # skeleton tree/state/motion
    "test_legacy_env.py",      # dm-style tolerance rewards
    "test_utils_extra.py",     # filters/normalizers/misc
    "test_aba.py",             # articulated-body solve vs dense Cholesky
    "test_training_curve.py",  # committed-artifact regression gates
    "test_render.py",          # offline renderer smoke
}


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m"):
        return
    runslow = config.getoption("--runslow")
    runfull = config.getoption("--runfull") or runslow
    skip_slow = pytest.mark.skip(reason="slow parity test: use --runslow")
    skip_full = pytest.mark.skip(reason="full tier: use --runfull (or --runslow)")
    for item in items:
        if "slow" in item.keywords:
            if not runslow:
                item.add_marker(skip_slow)
        elif not runfull and (item.fspath.basename not in SMOKE_FILES
                              or "full" in item.keywords):
            # files outside the smoke set, plus individual compile-heavy
            # tests demoted with @pytest.mark.full, wait for --runfull
            item.add_marker(skip_full)
