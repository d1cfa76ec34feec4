#!/bin/bash
# Round-5 queue, phase 4: refresh the benchmark-table variants under the
# pipelined protocol (the sync per-rep numbers carry ~30 ms tunnel RTT per
# rep; see docs/BENCHMARKS.md "Timing protocol").
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

while ! grep -q "QUEUE_R5_PHASE3 DONE" "$Q" 2>/dev/null; do sleep 60; done

run r5_bench_8k 2400 env BENCH_WORLDS=8192 BENCH_REPS=5 python bench.py
run r5_bench_perworld 2400 env BENCH_PROTOCOL=perworld BENCH_REPS=5 python bench.py
run r5_bench_iekf 2400 env BENCH_FILTER=iekf_slam BENCH_REPS=5 python bench.py
run r5_bench_ukf 3600 env BENCH_FILTER=ukf_slam BENCH_REPS=3 python bench.py
run r5_bench_ukfloc 2400 env BENCH_FILTER=ukf_loc BENCH_REPS=5 python bench.py
echo "=== QUEUE_R5_PHASE4 DONE $(date -u '+%F %T')" >> "$Q"
