#!/bin/bash
# Round-5 queue, phase 9 (session restart): the environment reset wiped
# .tpulogs/, so this script re-queues everything still outstanding, in
# judge-priority order:
#   1. phase-8 low-noise convergence floors (the parity renderer's
#      low-noise adjudication section is already coded and waiting on
#      docs/pgs_convergence_low{,_ekf}.json)
#   2. phase-7 IEKF pipelined retry + final headline confirmation
#      (both append to docs/bench_runs.jsonl — outage-proof record)
#   3. phase-6 C-endpoint floor at the uniform 64-world protocol
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

# phase 8: low-noise convergence floors
if [ ! -f docs/pgs_convergence_low.json ]; then
  run r5_conv_low_naive 5400 python scripts/pgs_budget_probe.py \
      --scale 0.9559 --worlds 64 --secondary naive \
      --budgets 50x40,150x40,400x80 \
      --out docs/pgs_convergence_low.json
fi
if [ ! -f docs/pgs_convergence_low_ekf.json ]; then
  run r5_conv_low_ekf 5400 python scripts/pgs_budget_probe.py \
      --scale 0.9559 --worlds 64 --secondary ekf_slam \
      --budgets 50x40,150x40,400x80 \
      --out docs/pgs_convergence_low_ekf.json
fi
echo "=== QUEUE_R5_PHASE8 DONE $(date -u '+%F %T')" >> "$Q"

# phase 7: IEKF pipelined retry + headline confirmation
run r5_bench_iekf2 2400 env BENCH_FILTER=iekf_slam BENCH_REPS=5 python bench.py
run r5_headline_final 2400 env BENCH_REPS=5 python bench.py
echo "=== QUEUE_R5_PHASE7 DONE $(date -u '+%F %T')" >> "$Q"

# phase 6: C-endpoint floor at the uniform protocol
if [ ! -f docs/pgs_convergence_cx.json ]; then
  run r5_conv_cx 5400 python scripts/pgs_budget_probe.py \
      --worlds 64 --secondary naive \
      --budgets 50x40,150x40,400x80 \
      --out docs/pgs_convergence_cx.json
fi
echo "=== QUEUE_R5_PHASE6 DONE $(date -u '+%F %T')" >> "$Q"
echo "=== QUEUE_R5I ALL DONE $(date -u '+%F %T')" >> "$Q"
