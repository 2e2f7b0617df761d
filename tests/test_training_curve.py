"""The committed round-2 training artifact proves learning end-to-end: a
150-epoch PPO run on the speed task (outputs/speed_curve_r2/log.txt, real
TPU) whose reward strictly improves (reference purpose: run.py:31-85 +
agent_humanoid.py optimize_policy)."""
import json
import os

import pytest

LOG = os.path.join(os.path.dirname(__file__), "..",
                   "outputs", "speed_curve_r2", "log.txt")


@pytest.mark.skipif(not os.path.exists(LOG), reason="training artifact absent")
def test_committed_training_curve_improves():
    rows = [json.loads(l) for l in open(LOG)]
    rews = [r["reward_mean"] for r in rows if "reward_mean" in r]
    assert len(rews) >= 100
    first, last = sum(rews[:10]) / 10, sum(rews[-10:]) / 10
    assert last > 2.5 * first, (first, last)
    # monotone-ish: every 30-epoch window mean beats the previous window
    w = 30
    means = [sum(rews[i:i + w]) / w for i in range(0, len(rews) - w + 1, w)]
    assert all(b > a for a, b in zip(means, means[1:])), means


R5_SPEED = os.path.join(os.path.dirname(__file__), "..",
                        "outputs", "speed_r5", "log.txt")
R5_GETUP = os.path.join(os.path.dirname(__file__), "..",
                        "outputs", "getup_r5", "log.txt")


@pytest.mark.skipif(not os.path.exists(R5_SPEED), reason="artifact absent")
def test_r5_speed_curve_at_product_config():
    """Round-5 PRODUCT-operating-point run: 4096 envs, calibrated solver
    (iters=16/tol=1e-4/rows=32), 150 epochs on real TPU. Gates: reward
    clears the r2 artifact's final level, and the solver stayed healthy
    (stalled_frac ~ 0 throughout)."""
    rows = [json.loads(l) for l in open(R5_SPEED)]
    rews = [r["reward_mean"] for r in rows if "reward_mean" in r]
    assert len(rews) >= 100
    last = sum(rews[-10:]) / 10
    assert last > sum(rews[:10]) / 10 * 1.3
    assert last > 0.47, last   # clears the r2 artifact's final reward
    stalled = [r["qp_stalled_frac"] for r in rows if "qp_stalled_frac" in r]
    assert sum(stalled) / len(stalled) < 0.05, max(stalled)


@pytest.mark.skipif(not os.path.exists(R5_GETUP), reason="artifact absent")
def test_r5_getup_curve_at_product_config():
    rows = [json.loads(l) for l in open(R5_GETUP)]
    rews = [r["reward_mean"] for r in rows if "reward_mean" in r]
    assert len(rews) >= 100
    first, last = sum(rews[:10]) / 10, sum(rews[-10:]) / 10
    assert last > first * 1.2, (first, last)
