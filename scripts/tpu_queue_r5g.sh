#!/bin/bash
# Round-5 queue, phase 7: retry the IEKF pipelined-protocol refresh (the
# phase-4 attempt hit a tunnel outage and structured-skipped), then a
# fresh headline confirmation run late in the round so BENCH_r05 capture
# has a warm, recently-verified path.
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

while ! grep -q "QUEUE_R5_PHASE6 DONE" "$Q" 2>/dev/null; do sleep 60; done

run r5_bench_iekf2 2400 env BENCH_FILTER=iekf_slam BENCH_REPS=5 python bench.py
run r5_headline_final 2400 env BENCH_REPS=5 python bench.py
echo "=== QUEUE_R5_PHASE7 DONE $(date -u '+%F %T')" >> "$Q"
