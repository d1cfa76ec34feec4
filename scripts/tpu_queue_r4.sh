#!/bin/bash
# Round-4 TPU chip-revalidation queue (VERDICT r3 "Next round" item 1).
# The axon tunnel allows ONE TPU client at a time, so every on-chip job is
# serialized here; each is bounded by `timeout` so a tunnel hang cannot wedge
# the queue. Logs land in .tpulogs/<job>.{out,err}.
set -u
cd /root/repo
mkdir -p .tpulogs
Q=.tpulogs/queue.log

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u '+%F %T')" >> "$Q"
  timeout "$tmo" "$@" > ".tpulogs/$name.out" 2> ".tpulogs/$name.err"
  local rc=$?
  echo "=== $name rc=$rc $(date -u '+%F %T')" >> "$Q"
  sleep 5   # let the tunnel release the client between jobs
}

# (a) headline EKF bench — green BENCH_r04 preview
run bench_ekf 1800 python bench.py
# (b) first-ever on-chip run of the IEKF Pallas kernel
run bench_iekf 2400 env BENCH_FILTER=iekf_slam python bench.py
# (c) UKF transcendental-elimination A/B vs documented 550 shared / 311 perworld
run bench_ukf_shared 2400 env BENCH_FILTER=ukf_slam python bench.py
run bench_ukf_perworld 3600 env BENCH_FILTER=ukf_slam BENCH_PROTOCOL=perworld python bench.py
# (d) one-pass Joseph fix at scale: no coasting tail expected
run ukf_tail 2400 python scripts/ukf_tail_check.py --worlds 512 --t 1000
# (e) accuracy matrix v2 resume: 7 PGS configs + 2 iekf solos in ONE process
run matrix_v2 16200 python scripts/accuracy_matrix.py --out docs/accuracy_matrix_v2.json

echo "=== QUEUE DONE $(date -u '+%F %T')" >> "$Q"
