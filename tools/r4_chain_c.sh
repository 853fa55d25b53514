#!/bin/bash
# Round-4 chain, resequenced remainder: the VERDICT-#5 VAE depth legs come
# before the (bonus) leg E so the open >=0.20 target gets hardware time.
# Queues behind whatever currently holds /tmp/vlg_tpu.lock.
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock

run() {
  local name=$1 tmo=$2; shift 2
  echo "R4C start $name ($(date))"
  flock "$LOCK" timeout "$tmo" "$@" > "/tmp/r4b_${name}.log" 2>&1
  echo "R4C done $name exit $? ($(date))"
  tail -2 "/tmp/r4b_${name}.log"
}

VAE="--families vae --epochs 144 --size 64 --free_bits 0.03 --kl_cycle 400 \
  --bg_weight 0.15 --capacity_max 40"

run gan256 7200 python tools/gan_convergence.py --size 256 --bs 8 \
  --epochs 8 --path /tmp/r4gan256

run vae_deep 7200 python tools/layout_convergence.py $VAE \
  --dec_refines 2 --path /tmp/r4vae_deep
run vae_lat64 7200 python tools/layout_convergence.py $VAE \
  --latent 64 --path /tmp/r4vae_lat64
run vae_lat16 7200 python tools/layout_convergence.py $VAE \
  --latent 16 --path /tmp/r4vae_lat16

COMMON="--hed_weights artifacts/hned_synth.npz \
  --vgg_weights artifacts/vgg_synth.npz \
  --ckpt artifacts/flagship/checkpoint/096 --lr 5e-5"
run legE 14400 python tools/convergence_run.py $COMMON --epochs 72 \
  --multistep_k 4 --multistep_discount 0.6 \
  --multistep_feedback_noise 0.1 --fidelity_every 12 --path /tmp/r4legE

echo "R4C chain complete ($(date))"
