#!/bin/bash
# Round-5 queue, phase 10: finish the C-endpoint convergence floor.
# r5_conv_cx hung mid-call on the 150x40 budget (the known tunnel
# mid-call hang; 0.5% CPU for 40 min) and was killed after saving its
# 50x40 point. pgs_budget_probe.py does NOT merge into an existing out
# file, so the remaining budgets run as SEPARATE invocations to
# separate files (one hang can no longer take out the rest); the
# CPU-side fold merges them into docs/pgs_convergence_cx.json.
# Finally: one headline bench with the fixed ride-out probe (20bc7a0)
# so the round closes with a green on-chip confirmation in
# docs/bench_runs.jsonl.
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

if [ ! -f docs/pgs_convergence_cx_150.json ]; then
  run r5_conv_cx_150 2700 python scripts/pgs_budget_probe.py \
      --worlds 64 --secondary naive \
      --budgets 150x40 \
      --out docs/pgs_convergence_cx_150.json
fi
if [ ! -f docs/pgs_convergence_cx_400.json ]; then
  run r5_conv_cx_400 3600 python scripts/pgs_budget_probe.py \
      --worlds 64 --secondary naive \
      --budgets 400x80 \
      --out docs/pgs_convergence_cx_400.json
fi
run r5_headline_final2 2400 env BENCH_REPS=5 python bench.py
echo "=== QUEUE_R5J ALL DONE $(date -u '+%F %T')" >> "$Q"
