#!/bin/bash
# Round-5 session-2 serialized TPU queue. Order is by VERDICT-r4 leverage
# with the cheap closure leg (VAE 288-ep) slotted between the fidelity
# pairs so a mid-session outage still leaves closed items:
#   1. probe the cold tunnel + one bench run (warms the round-end bench
#      programs into .jax_cache — the r4 boundary bench died cold)
#   2. fidelity legs W, G (image-channel levers; decomposition-indicated)
#   3. plain-VAE 288-epoch latent-64 leg (VERDICT #6 endpoint)
#   4. fidelity legs S, L, C
#   5. CVAE exposure campaign (VERDICT #5)
# Every TPU entry point below takes /tmp/vlg_tpu.lock itself or is
# wrapped here; everything is timeout-bounded.
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock

echo "R5S2 queue start ($(date))"
bash tools/tpu_recover_probe.sh 2>&1 | tail -5

bash tools/r5_fidelity.sh W G

echo "R5S2 vae288 start ($(date))"
flock "$LOCK" timeout 3600 python tools/layout_convergence.py \
  --families vae --epochs 288 --size 64 --free_bits 0.03 --kl_cycle 400 \
  --bg_weight 0.15 --capacity_max 40 --latent 64 --path /tmp/r5vae288 \
  > /tmp/r5vae288.log 2>&1
echo "R5S2 vae288 exit $? ($(date))"
grep -o '"miou": [0-9.]*' /tmp/r5vae288.log | tail -3

bash tools/r5_fidelity.sh S L C

bash tools/r5_cvae_exposure.sh

echo "R5S2 queue complete ($(date))"
