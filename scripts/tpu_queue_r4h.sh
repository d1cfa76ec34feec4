#!/bin/bash
# Round-4 queue, phase 8: separate the density lever from the solver budget.
# The 64-world on-chip nl=60 run at the default 50x40 budget landed at 1.79
# (no better than nl=20); the 8-world CPU probe that found 0.91 ran at
# 150x40. A/B on chip: nl=60 @ 150x40, then nl=20 @ 150x40 (control).
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

run lm60_150 3000 python scripts/parity_lm60.py --worlds 64 --chunk 64 \
    --gn 150 --cg 40 --out docs/parity_lm60_150x40.json
run lm20_150 3000 python scripts/parity_lm60.py --worlds 64 --chunk 64 \
    --nl 20 --gn 150 --cg 40 --out docs/parity_lm20_150x40.json
run lm60_150 3000 python scripts/parity_lm60.py --worlds 64 --chunk 64 \
    --gn 150 --cg 40 --out docs/parity_lm60_150x40.json
run lm20_150 3000 python scripts/parity_lm60.py --worlds 64 --chunk 64 \
    --nl 20 --gn 150 --cg 40 --out docs/parity_lm20_150x40.json
echo "=== QUEUE8 DONE $(date -u '+%F %T')" >> "$Q"
