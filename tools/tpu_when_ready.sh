#!/bin/bash
# Poll the axon TPU tunnel; when healthy, run (in order)
#   1. per-block substep breakdown  -> BENCH_BREAKDOWN_r03.json
#   2. throughput bench             -> /tmp/bench_r03.json
#   3. getup + reach training curves (VERDICT r2 item 10) -> outputs/*_curve_r3
# Logs to /tmp/tpu_ready.log.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128)); assert float(np.asarray(x @ x)[0, 0]) == 128.0
" 2>/dev/null; then
    echo "[tpu_when_ready] TPU healthy at $(date)" | tee -a /tmp/tpu_ready.log
    echo "=== bench_substep B=1024 ===" >> /tmp/tpu_ready.log
    BENCH_JSON=/root/repo/BENCH_BREAKDOWN_r03.json timeout 2400 \
      python -u tools/bench_substep.py >> /tmp/tpu_ready.log 2>&1
    echo "=== bench.py ===" >> /tmp/tpu_ready.log
    timeout 1800 python -u bench.py > /tmp/bench_r03.json 2>> /tmp/tpu_ready.log
    cat /tmp/bench_r03.json >> /tmp/tpu_ready.log
    echo "=== getup curve ===" >> /tmp/tpu_ready.log
    timeout 7200 python -u -m smplsim_tpu.run env=getup num_epochs=150 \
      exp_name=getup_curve_r3 >> /tmp/tpu_ready.log 2>&1
    echo "=== reach curve ===" >> /tmp/tpu_ready.log
    timeout 7200 python -u -m smplsim_tpu.run env=reach num_epochs=150 \
      exp_name=reach_curve_r3 >> /tmp/tpu_ready.log 2>&1
    echo "[tpu_when_ready] done at $(date)" >> /tmp/tpu_ready.log
    exit 0
  fi
  sleep 120
done
echo "[tpu_when_ready] gave up after 200 polls" >> /tmp/tpu_ready.log
