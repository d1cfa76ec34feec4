#!/bin/bash
# Round-4 TPU queue, phase 4 (optional): EKF headline block-size sweep.
# Today's steady-state is 0.111 s/rep at bl=256 vs r2's 0.089-0.091 with an
# UNCHANGED kernel program — if the remote Mosaic service's codegen shifted,
# the optimal block size may have moved with it. Sweep bl and record.
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

export BENCH_SKIP_PROBE=1
for bl in 128 192 256 320 512; do
  run "bench_bl$bl" 2400 env BENCH_BLOCK=$bl BENCH_REPS=5 python bench.py
done

echo "=== QUEUE4 DONE $(date -u '+%F %T')" >> "$Q"
