#!/bin/bash
# Round-5 queue, phase 3: closed-loop igvc benchmark on-chip (VERDICT r4 #4)
# through the segmented runner (the single-call variant crashed the TPU
# worker), then a 4096-world scale point if the 1024-world run is healthy.
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

while ! grep -q "QUEUE_R5_PHASE2 DONE" "$Q" 2>/dev/null; do sleep 60; done

run r5_closed_loop_1k 5400 env BENCH_FILTER=closed_loop BENCH_WORLDS=1024 \
    BENCH_STEPS=1000 BENCH_REPS=3 BENCH_CL_SEG=20 python bench.py
if grep -q "r5_closed_loop_1k rc=0" "$Q"; then
  run r5_closed_loop_4k 7200 env BENCH_FILTER=closed_loop BENCH_WORLDS=4096 \
      BENCH_STEPS=1000 BENCH_REPS=3 BENCH_CL_SEG=10 python bench.py
fi
echo "=== QUEUE_R5_PHASE3 DONE $(date -u '+%F %T')" >> "$Q"
