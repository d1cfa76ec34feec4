#!/bin/bash
# Round-5 queue, phase 5: convergence-path sweeps for the W-family interior
# points. The reachability adjudication (REFERENCE_PARITY.md W-family
# section) rests on each member's CONVERGED naive_high_one_time optimum —
# if W x3 / W x5 were still descending at the default 50x40 budget, their
# "published value unreachable" verdicts would be unsound. These sweeps
# measure the converged floor on-chip at 64 worlds.
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

while ! grep -q "QUEUE_R5_PHASE4 DONE" "$Q" 2>/dev/null; do sleep 60; done

for W in 3 5; do
  run "r5_conv_w$W" 7200 python scripts/pgs_budget_probe.py \
      --w-scale "$W" --worlds 64 --secondary naive \
      --budgets 50x40,150x40,400x80 \
      --out "docs/pgs_convergence_w${W}x.json"
done
echo "=== QUEUE_R5_PHASE5 DONE $(date -u '+%F %T')" >> "$Q"
