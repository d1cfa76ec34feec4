#!/bin/bash
# Round-5 queue, phase 6: the C-endpoint convergence floor, on-chip at the
# same protocol as the W x3/x5/x10 floors (64 worlds, naive_high_one_time,
# budgets 50x40/150x40/400x80). The family reachability table currently
# judges C from an 8-world CPU sweep whose +-0.72 CI is too wide to be
# decisive; this replaces it with a like-for-like on-chip floor.
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

while ! grep -q "QUEUE_R5_PHASE5 DONE" "$Q" 2>/dev/null; do sleep 60; done

run r5_conv_cx 7200 python scripts/pgs_budget_probe.py \
    --worlds 64 --secondary naive \
    --budgets 50x40,150x40,400x80 \
    --out docs/pgs_convergence_cx.json
echo "=== QUEUE_R5_PHASE6 DONE $(date -u '+%F %T')" >> "$Q"
