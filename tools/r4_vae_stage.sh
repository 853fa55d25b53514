#!/bin/bash
# Round-4 stage C (VERDICT r3 #5): plain-VAE depth round — add capacity
# scheduling (the only solo floor-breaker in the r3 matrix) to the
# free-bits + cyclical-beta + bg-weight combo, plus a deeper decoder and a
# latent-size sweep. Matched 144-epoch runs at 64px (BASELINE config 1).
#
#   bash tools/r4_vae_stage.sh [legs...]   # default: cap deep lat64 lat16
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock
COMBO="--families vae --epochs 144 --size 64 --free_bits 0.03 \
  --kl_cycle 400 --bg_weight 0.15 --capacity_max 40"

run_leg() {
  local name=$1; shift
  echo "R4V start $name ($(date))"
  flock "$LOCK" timeout 5400 python tools/layout_convergence.py $COMBO \
    --path "/tmp/r4vae_${name}" "$@" > "/tmp/r4vae_${name}.log" 2>&1
  echo "R4V done $name exit $? ($(date))"
  grep -o '"miou": [0-9.]*' "/tmp/r4vae_${name}.log" | tail -3
}

run_cvae256() {
  # BASELINE config #3 at its stated operating point: 16-frame
  # autoregressive CVAE rollout at 256x256 (r2 demonstrated 8-frame @64px)
  echo "R4V start cvae256 ($(date))"
  flock "$LOCK" timeout 7200 python tools/layout_convergence.py \
    --families cvae --size 256 --rollout_frames 16 --epochs 36 \
    --latent 64 --path /tmp/r4vae_cvae256 > /tmp/r4vae_cvae256.log 2>&1
  echo "R4V done cvae256 exit $? ($(date))"
  grep -E "rollout_fidelity|miou" /tmp/r4vae_cvae256.log | tail -2
}

run_gan256() {
  # BASELINE config #4 at full production resolution: adversarial
  # training stability at 256px (r3 quality A/B ran at 128px)
  echo "R4V start gan256 ($(date))"
  flock "$LOCK" timeout 5400 python tools/gan_convergence.py --size 256 \
    --bs 8 --epochs 8 --path /tmp/r4gan256 > /tmp/r4gan256.log 2>&1
  echo "R4V done gan256 exit $? ($(date))"
  grep -E "^epoch|D loss range" /tmp/r4gan256.log | tail -3
}

for leg in "${@:-cap deep lat64 lat16 cvae256 gan256}"; do
  case $leg in
    cap)   run_leg cap ;;                      # combo + capacity
    deep)  run_leg deep --dec_refines 2 ;;     # + deeper decoder
    lat64) run_leg lat64 --latent 64 ;;        # latent-size sweep up
    lat16) run_leg lat16 --latent 16 ;;        # latent-size sweep down
    cvae256) run_cvae256 ;;
    gan256) run_gan256 ;;
    *) echo "unknown leg $leg" ;;
  esac
done
echo "R4V stage C complete ($(date))"
