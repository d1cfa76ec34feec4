#!/bin/bash
# Round-5 queue, phase 2: intermediate-W sweep. C (W x1) and D (W x10) tie
# 11/20 on combined-CI containment but miss in opposite directions on the
# high-noise pgs_result column; sweeping the W dial at x3 / x5 traces the
# whole single-profile family so the adjudication (and the "no single
# profile explains everything" bound) is quantitative, not 2-point.
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

# single-TPU-client rule: wait for phase 1 to finish
while ! grep -q "QUEUE_R5_PHASE1 DONE" "$Q" 2>/dev/null; do sleep 60; done

HIGH=naive_high_one_time,ekf_slam_high_one_time,naive_high_iter,ekf_slam_high_iter
for W in 3 5; do
  run "r5_wsweep_w$W" 10800 python scripts/reference_parity.py \
      --w-scale "$W" --worlds 128 --worlds-iter 64 --worlds-cal 128 \
      --only "$HIGH" --out "docs/reference_parity_w${W}x.json"
  # one retry in case the tunnel dropped mid-run (resume-safe)
  run "r5_wsweep_w$W" 10800 python scripts/reference_parity.py \
      --w-scale "$W" --worlds 128 --worlds-iter 64 --worlds-cal 128 \
      --only "$HIGH" --out "docs/reference_parity_w${W}x.json"
done
echo "=== QUEUE_R5_PHASE2 DONE $(date -u '+%F %T')" >> "$Q"
