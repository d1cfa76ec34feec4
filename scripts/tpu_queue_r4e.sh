#!/bin/bash
# Round-4 TPU queue, final mop-up:
#  1. the one matrix config the 2x7200s attempts didn't reach
#     (ekf_slam_low_iter; config-level resume makes this a single ~35 min run)
#  2. the W-scaled parity discriminator: calibration + solo filters under
#     scale_w=True — if the compat EKF lands near the reference's published
#     0.93-1.40 m (vs 2.58 m with W fixed), the reference's unrecorded
#     high-noise profile scaled BOTH params.yaml noise dials.
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
  if ! wait_for_tpu 3600; then
    echo "=== $name SKIPPED (tunnel down 1h) $(date -u '+%F %T')" >> "$Q"
    return 1
  fi
  sleep 45
  echo "=== $name start $(date -u '+%F %T')" >> "$Q"
  timeout "$tmo" "$@" > ".tpulogs/$name.out" 2> ".tpulogs/$name.err"
  echo "=== $name rc=$? $(date -u '+%F %T')" >> "$Q"
  sleep 15
}

export BENCH_SKIP_PROBE=1
run matrix_mopup 3000 python scripts/accuracy_matrix.py --out docs/accuracy_matrix_v2.json
run parity_w_solos 2400 python scripts/reference_parity.py --scale-w --solos-only --out docs/reference_parity_w.json

echo "=== QUEUE5 DONE $(date -u '+%F %T')" >> "$Q"
