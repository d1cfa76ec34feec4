#!/bin/bash
# Round-4 TPU queue, phase 2: retries for jobs the flaky tunnel skipped in
# phase 1 (the probe hangs if invoked too soon after the previous client
# exits — hence the 60 s inter-job gap), plus the remaining measurement
# work: predication A/B (ADVICE r3 #4), matrix-scale consistency study
# (VERDICT #8), and the reference-magnitude parity run (VERDICT #4).
set -u
cd /root/repo
mkdir -p .tpulogs
Q=.tpulogs/queue.log

run() {
  local name=$1 tmo=$2; shift 2
  for attempt in 1 2; do
    echo "=== $name a$attempt start $(date -u '+%F %T')" >> "$Q"
    timeout "$tmo" "$@" > ".tpulogs/$name.out" 2> ".tpulogs/$name.err"
    local rc=$?
    echo "=== $name a$attempt rc=$rc $(date -u '+%F %T')" >> "$Q"
    sleep 60
    # success AND not a tpu-unavailable skip -> done
    if [ $rc -eq 0 ] && ! grep -q '"skipped"' ".tpulogs/$name.out" 2>/dev/null; then
      return 0
    fi
  done
}

run bench_iekf 2400 env BENCH_FILTER=iekf_slam python bench.py
run bench_ukf_perworld 3600 env BENCH_FILTER=ukf_slam BENCH_PROTOCOL=perworld python bench.py
run ukf_pred_ab 2400 python scripts/ukf_predication_ab.py --worlds 256 --t 1000
# low-noise heavy-tail attribution (VERDICT #6): rejecting vs clean worlds
run ukf_tail_low 2400 python scripts/ukf_tail_check.py --worlds 1024 --t 1000 --noise low
run consistency_big 5400 python scripts/consistency.py --worlds 256 --t 1000 --slots 20 --out docs/consistency.json
# bearing-deviation range (TODO r3 atan2->asin: measure first)
run bearing_range 2400 python scripts/ukf_bearing_range.py --worlds 16 --t 500
run bearing_range_low 2400 python scripts/ukf_bearing_range.py --worlds 16 --t 500 --noise low
# headline re-measure with more reps (9029 vs r2's 11208: reps=3 is noisy
# through the tunnel; 10 reps separates steady-state from tunnel variance)
run bench_ekf_reps10 2400 env BENCH_REPS=10 python bench.py
# the two long jobs last, both config-level resume-safe
run matrix_v2 7200 python scripts/accuracy_matrix.py --out docs/accuracy_matrix_v2.json
run ref_parity 10800 python scripts/reference_parity.py --out docs/reference_parity.json

echo "=== QUEUE2 DONE $(date -u '+%F %T')" >> "$Q"
