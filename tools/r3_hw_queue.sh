#!/bin/bash
# Round-3 hardware measurement queue (VERDICT r2 #2/#3/#7), run once the
# tunnel answers. Strictly serial — one TPU job at a time (CLAUDE.md).
# All TPU jobs take the shared lock /tmp/vlg_tpu.lock (flock) so this queue
# cannot race tpu_recover_probe.sh (ADVICE r3 medium).
# Logs: /tmp/r3_<name>.log ; summary lines grep "R3Q".
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock

wait_tpu() {
  for i in $(seq 1 40); do
    if flock "$LOCK" timeout 420 python -c "
import jax, jax.numpy as jnp
print('TPU_OK', float(jax.jit(lambda x: (x*2).sum())(jnp.ones((64,64)))))
" 2>/dev/null | grep -q TPU_OK; then
      echo "R3Q tpu ok (attempt $i, $(date))"; return 0
    fi
    sleep 60
  done
  echo "R3Q tpu never answered"; return 1
}

run() {
  local name=$1 tmo=$2; shift 2
  echo "R3Q start $name ($(date))"
  flock "$LOCK" timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  local rc=$?
  echo "R3Q done $name exit $rc ($(date))"
  tail -3 "/tmp/r3_${name}.log"
  if [ "$rc" = 124 ]; then
    # job was SIGTERMed mid-RPC — re-probe liveness before the next job so a
    # degraded remote server doesn't silently eat the rest of the queue
    echo "R3Q $name hit timeout; re-probing tunnel"
    wait_tpu || exit 1
  fi
}

wait_tpu || exit 1

# 1. bench (warms the driver's end-of-round programs into .jax_cache,
#    including the batch-1 latency program — give it the queue's budget)
run bench 2500 env VLG_BENCH_BUDGET=2400 python bench.py

# 2. chunked host-fed dispatch wall-clock (VERDICT #2 done-criterion)
run chunk 3600 python tools/bench_chunk_scan.py --k 8

# 3. train-step lever sweep (VERDICT #3a)
run levers 5400 python tools/train_step_levers.py

# 4. insplit packed-conv A/B (VERDICT #3b) — perf-relevant, before GAN
run insplit 5400 python tools/ab_insplit.py

# 5. GAN quality A/B at matched compute (VERDICT #7)
run gan 3600 python tools/gan_convergence.py --epochs 12
run nogan 3600 python tools/gan_convergence.py --epochs 12 --no_gan

echo "R3Q queue complete ($(date))"
