"""Real multi-process distributed training test.

The reference has no distributed backend (SURVEY §2.10); our multi-host path
is jax.distributed + a data-parallel mesh. This test launches TWO separate
processes, each owning 4 virtual CPU devices, initializes jax.distributed
across them (the standard JAX fake-cluster trick standing in for a 2-host
TPU pod), and runs the full sharded PPO train step over the GLOBAL 8-device
mesh — exercising cross-process collectives (psum/pmean grad reductions)
end-to-end, not just the single-process 8-device mesh of test_parallel.py.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_ppo_step():
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "WORKER_OK" in out, out[-2000:]
    # the replicated param digest must agree across processes
    digests = [
        line.split("digest=")[1]
        for out in outs for line in out.splitlines() if "WORKER_OK" in line
    ]
    assert len(digests) == 2 and digests[0] == digests[1], digests
