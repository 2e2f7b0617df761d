"""CLI entry point: train or eval a humanoid policy.

TPU-native replacement for the reference's hydra CLI (smpl_sim/run.py:31-85):

    python -m smplsim_tpu.run env=speed seed=0 num_epochs=200
    python -m smplsim_tpu.run env=getup test=true epoch=-1

Overrides use dotted key=value paths into RunConfig (agents/config.py).
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from smplsim_tpu.agents import AgentHumanoid, RunConfig, parse_cli_overrides


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    cfg = parse_cli_overrides(RunConfig(), argv)
    agent = AgentHumanoid(cfg)
    if cfg.test:
        agent.run_policy()
    else:
        agent.optimize_policy()


if __name__ == "__main__":
    main()
