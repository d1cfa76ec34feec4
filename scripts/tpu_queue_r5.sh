#!/bin/bash
# Round-5 queue, phase 1: (a) headline re-measure under the pipelined
# protocol, (b) first on-chip closed-loop igvc benchmark (VERDICT r4 #4),
# (c) hypothesis-D convergence-path probe — does the published 0.93 m
# naive_high_one_time pgs_result lie on the optimizer's convergence path
# between the naive initial (2.27) and our converged optimum (0.64)?
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

run r5_headline_pipe 1800 env BENCH_REPS=10 python bench.py
run r5_closed_loop 3600 env BENCH_FILTER=closed_loop BENCH_WORLDS=1024 \
    BENCH_STEPS=1000 BENCH_REPS=5 python bench.py
run r5_conv_d 7200 python scripts/pgs_budget_probe.py --scale-w --worlds 64 \
    --secondary naive --budgets 1x40,2x40,3x40,5x40,8x40,15x40,25x40,50x40 \
    --out docs/pgs_convergence_d.json
echo "=== QUEUE_R5_PHASE1 DONE $(date -u '+%F %T')" >> "$Q"
