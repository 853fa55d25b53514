#!/bin/bash
# Probe the tunneled TPU until it answers, then run the benchmark once.
# (The tunnel can wedge server-side; see CLAUDE.md.)
cd "$(dirname "$0")/.."
# Shared TPU-job lock: never run concurrently with r3_hw_queue.sh / bench
# (ADVICE r3 medium — two TPU jobs at once corrupt every timing).
LOCK=/tmp/vlg_tpu.lock
for i in $(seq 1 80); do
  # 300s per attempt: a recovering/stormy tunnel has answered this trivial
  # op in 60-390s (round 3) — a 60s deadline never sees the recovery.
  if flock "$LOCK" timeout 300 python -c "
import jax, jax.numpy as jnp
print('TPU_OK', float(jax.jit(lambda x: (x*2).sum())(jnp.ones((64,64)))))
" 2>/dev/null | grep -q TPU_OK; then
    echo "TPU RECOVERED at attempt $i ($(date))"
    # bench.py takes the TPU lock itself now — wrapping it in flock here
    # would hold the lock over bench's own bounded-wait acquisition
    timeout 3000 python bench.py \
        > /tmp/bench_after_recovery.json \
        2>/tmp/bench_after_recovery.err
    echo "bench after recovery:"
    cat /tmp/bench_after_recovery.json
    exit 0
  fi
  sleep 120
done
echo "TPU still wedged after 80 attempts ($(date))"
exit 1
