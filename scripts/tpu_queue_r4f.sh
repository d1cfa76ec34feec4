#!/bin/bash
# Round-4 TPU queue, phase 6 (session restart recovery): the previous session
# ended mid-ref_parity (job died with the session at ~06:2x). Everything here
# is config-level resume-safe. Order: the cheap W-scaled discriminator first
# (it decides how we interpret the finished parity rows), then the single
# remaining matrix-v2 config, then the ref_parity resume (longest last).
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
  sleep 45   # let the probe client release before the real job attaches
  echo "=== $name start $(date -u '+%F %T')" >> "$Q"
  timeout "$tmo" "$@" > ".tpulogs/$name.out" 2> ".tpulogs/$name.err"
  echo "=== $name rc=$? $(date -u '+%F %T')" >> "$Q"
  sleep 15
}

export BENCH_SKIP_PROBE=1
run parity_w_solos 3600 python scripts/reference_parity.py --scale-w --solos-only --out docs/reference_parity_w.json
run matrix_mopup 3600 python scripts/accuracy_matrix.py --out docs/accuracy_matrix_v2.json
run ref_parity 10800 python scripts/reference_parity.py --out docs/reference_parity.json
run ref_parity 10800 python scripts/reference_parity.py --out docs/reference_parity.json

echo "=== QUEUE6 DONE $(date -u '+%F %T')" >> "$Q"
