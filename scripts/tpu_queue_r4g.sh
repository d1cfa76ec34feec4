#!/bin/bash
# Round-4 queue, phase 7: one job — the on-chip nl=60 confirmation at 64
# worlds (single chunk; the 128-world run lost its second chunk to a tunnel
# drop). Same discipline as _r4f: probe, 45 s release gap, bounded retry.
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

run parity_lm60 2400 python scripts/parity_lm60.py --worlds 64 --chunk 64
run parity_lm60 2400 python scripts/parity_lm60.py --worlds 64 --chunk 64
echo "=== QUEUE7 DONE $(date -u '+%F %T')" >> "$Q"
