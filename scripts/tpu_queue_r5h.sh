#!/bin/bash
# Round-5 queue, phase 8: low-noise convergence floors. Four of the six
# numbers the adopted profile leaves outside the combined CI are low-noise
# pgs_result rows, all repo-above-published by +16-24% — the same signature
# the solver-convergence DOF explained at high noise (published value ON
# the convergence path). These sweeps measure whether the published
# low-noise pgs_result values also lie on the low-regime convergence path
# (naive and EKF secondaries, one_time, calibrated low scale 0.9559,
# W x1 — the whole family shares the low rows).
set -u
cd /root/repo
mkdir -p .tpulogs
Q=.tpulogs/queue.log

wait_for_tpu() {
  local deadline=$(( $(date +%s) + $1 ))
  while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 150 python -c "
import jax, jax.numpy as jnp
y = jnp.ones((128, 128)) @ jnp.ones((128, 128))
print('ok', float(y[0, 0]))" > /dev/null 2>&1; then
      return 0
    fi
    echo "=== tunnel still down $(date -u '+%F %T')" >> "$Q"
    sleep 60
  done
  return 1
}

run() {
  local name=$1 tmo=$2; shift 2
  if ! wait_for_tpu 7200; then
    echo "=== $name SKIPPED (tunnel down 2h) $(date -u '+%F %T')" >> "$Q"
    return 1
  fi
  sleep 45
  echo "=== $name start $(date -u '+%F %T')" >> "$Q"
  timeout "$tmo" "$@" > ".tpulogs/$name.out" 2> ".tpulogs/$name.err"
  echo "=== $name rc=$? $(date -u '+%F %T')" >> "$Q"
  sleep 15
}

while ! grep -q "QUEUE_R5_PHASE7 DONE" "$Q" 2>/dev/null; do sleep 60; done

run r5_conv_low_naive 7200 python scripts/pgs_budget_probe.py \
    --scale 0.9559 --worlds 64 --secondary naive \
    --budgets 50x40,150x40,400x80 \
    --out docs/pgs_convergence_low.json
run r5_conv_low_ekf 7200 python scripts/pgs_budget_probe.py \
    --scale 0.9559 --worlds 64 --secondary ekf_slam \
    --budgets 50x40,150x40,400x80 \
    --out docs/pgs_convergence_low_ekf.json
echo "=== QUEUE_R5_PHASE8 DONE $(date -u '+%F %T')" >> "$Q"
