#!/bin/bash
# Round-4 TPU queue, phase 3: tunnel-outage-aware. The axon tunnel recovered
# at ~00:35, ran five jobs, then dropped again at ~01:01 (every probe since
# hangs). Instead of burning per-job timeouts against a dead tunnel, each job
# first WAITS for a killable probe to succeed (poll every 60 s, up to
# wait_budget), then runs. Jobs are resume-safe where long (matrix, parity).
set -u
cd /root/repo
mkdir -p .tpulogs
Q=.tpulogs/queue.log

wait_for_tpu() { # $1 = max seconds to wait
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
  if ! wait_for_tpu 14400; then
    echo "=== $name SKIPPED (tunnel down 4h) $(date -u '+%F %T')" >> "$Q"
    return 1
  fi
  sleep 45   # let the probe client release before the real job attaches
  echo "=== $name start $(date -u '+%F %T')" >> "$Q"
  timeout "$tmo" "$@" > ".tpulogs/$name.out" 2> ".tpulogs/$name.err"
  local rc=$?
  echo "=== $name rc=$rc $(date -u '+%F %T')" >> "$Q"
  sleep 15
}

export BENCH_SKIP_PROBE=1   # the queue probes; bench.py need not re-probe

run bench_iekf 2400 env BENCH_FILTER=iekf_slam python bench.py
run bench_ukf_perworld 3600 env BENCH_FILTER=ukf_slam BENCH_PROTOCOL=perworld python bench.py
run ukf_pred_ab 2400 python scripts/ukf_predication_ab.py --worlds 256 --t 1000
run ukf_tail_low 2400 python scripts/ukf_tail_check.py --worlds 1024 --t 1000 --noise low
run consistency_big 5400 python scripts/consistency.py --worlds 256 --t 1000 --slots 20 --out docs/consistency.json
run bearing_range 2400 python scripts/ukf_bearing_range.py --worlds 16 --t 500
run bearing_range_low 2400 python scripts/ukf_bearing_range.py --worlds 16 --t 500 --noise low
run bench_ekf_reps10 2400 env BENCH_REPS=10 python bench.py
# the two long jobs last, both config-level resume-safe
run matrix_v2 7200 python scripts/accuracy_matrix.py --out docs/accuracy_matrix_v2.json
run matrix_v2 7200 python scripts/accuracy_matrix.py --out docs/accuracy_matrix_v2.json
run ref_parity 10800 python scripts/reference_parity.py --out docs/reference_parity.json
run ref_parity 10800 python scripts/reference_parity.py --out docs/reference_parity.json

echo "=== QUEUE3 DONE $(date -u '+%F %T')" >> "$Q"
