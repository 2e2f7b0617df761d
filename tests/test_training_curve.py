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
