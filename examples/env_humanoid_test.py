"""Smoke-run a task env with zero actions (reference
examples/env_humanoid_test.py equivalent).

    python examples/env_humanoid_test.py env=speed steps=100
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from smplsim_tpu.agents.config import RunConfig, parse_cli_overrides  # noqa: E402
from smplsim_tpu.envs.tasks import TASKS  # noqa: E402
from smplsim_tpu.models import registry  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("steps=")]
    steps = next(
        (int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("steps=")), 100
    )
    cfg = parse_cli_overrides(RunConfig(), args)
    model = registry.default_humanoid()
    env = TASKS[cfg.task](model, cfg.env)
    st = env.reset(jax.random.PRNGKey(cfg.seed))
    step = jax.jit(env.step_autoreset)
    a = jnp.zeros(env.action_size)
    t0 = time.perf_counter()
    total_r = 0.0
    for t in range(steps):
        st = step(st, a)
        total_r += float(st.reward)
    dt = time.perf_counter() - t0
    print(
        f"{cfg.task}: {steps} steps, mean reward {total_r / steps:.4f}, "
        f"{steps / dt:.1f} steps/s, obs finite: "
        f"{bool(np.isfinite(np.asarray(st.obs)).all())}"
    )


if __name__ == "__main__":
    main()
