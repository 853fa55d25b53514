#!/bin/bash
# Round-4 main chain (after the artifact stage A): ordered by verdict
# leverage so an early round end still banks the top items.
#   1. flagship 96-ep base (resume; resume now device_puts state so it
#      reuses the fresh-run program)          -> fidelity campaign base
#   2. fidelity decomposition (VERDICT #2 diagnosis)
#   3. full-resolution 1024x2048 legacy eval  (VERDICT #6)
#   4. leg R: scheduled-sampling ramp         (VERDICT #8)
#   5. leg F: K=4 + feedback noise, 72 ep     (VERDICT #2 main leg)
#   6. VAE combo+capacity 144 ep              (VERDICT #5 core)
#   7. CVAE 16-frame @256px                   (BASELINE config #3)
#   8. GAN @256px stability                   (BASELINE config #4)
#   9. leg E: K=4 + discount + noise, 72 ep   (VERDICT #2 extension)
#  10. VAE deep / lat64 / lat16 remedy legs   (VERDICT #5 depth)
# Strictly serial under /tmp/vlg_tpu.lock. NEVER SIGTERM a job that is
# merely quiet: storm-time remote compiles have taken 17+ min for a tiny
# program (2026-08-20) — that is why the timeouts below are generous.
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock

run() {
  local name=$1 tmo=$2; shift 2
  echo "R4B start $name ($(date))"
  flock "$LOCK" timeout "$tmo" "$@" > "/tmp/r4b_${name}.log" 2>&1
  echo "R4B done $name exit $? ($(date))"
  tail -2 "/tmp/r4b_${name}.log"
}

COMMON="--hed_weights artifacts/hned_synth.npz \
  --vgg_weights artifacts/vgg_synth.npz"

# 1. flagship 48 -> 96
run flagship96 7200 python tools/convergence_run.py $COMMON --epochs 96 \
  --path artifacts/flagship --resume latest

CKPT=artifacts/flagship/checkpoint/096
if [ ! -d "$CKPT" ]; then
  echo "R4B: no 96-ep checkpoint; falling back to 048 as campaign base"
  CKPT=artifacts/flagship/checkpoint/048
fi

# 2. decomposition on the base
run decompose 5400 python tools/fidelity_decompose.py --ckpt "$CKPT" \
  --hed_weights artifacts/hned_synth.npz

# 3. full-res legacy eval (reference contract 1024x2048, src/val.py:176)
run fullres_val 5400 python -m video_layout_generation_tpu.val \
  --model u_net --bs 1 --size 1024 2048 --n_samples 4 --nw 2 \
  --save_dir /tmp/val_fullres

LEG="$COMMON --ckpt $CKPT --lr 5e-5"
# 4. leg R: scheduled-sampling ramp 0->0.5 over 12 ep
run legR 5400 python tools/convergence_run.py $LEG --epochs 12 \
  --scheduled_sampling 0.5 --scheduled_ramp 12 --path /tmp/r4legR

# 5. leg F: K=4 + feedback noise 0.1, 72 epochs, in-training fidelity
run legF 14400 python tools/convergence_run.py $LEG --epochs 72 \
  --multistep_k 4 --multistep_feedback_noise 0.1 --fidelity_every 12 \
  --path /tmp/r4legF

# 6. VAE combo + capacity (the r3 combo plus the solo floor-breaker)
run vae_cap 7200 python tools/layout_convergence.py --families vae \
  --epochs 144 --size 64 --free_bits 0.03 --kl_cycle 400 \
  --bg_weight 0.15 --capacity_max 40 --path /tmp/r4vae_cap

# 7. CVAE 16-frame rollout at 256px (BASELINE config #3 operating point)
run cvae256 10800 python tools/layout_convergence.py --families cvae \
  --size 256 --rollout_frames 16 --epochs 36 --latent 64 \
  --path /tmp/r4vae_cvae256

# 8. GAN at 256px (BASELINE config #4 "full-resolution")
run gan256 7200 python tools/gan_convergence.py --size 256 --bs 8 \
  --epochs 8 --path /tmp/r4gan256

# 9. leg E: K=4 + discount 0.6 + noise 0.1, 72 epochs
run legE 14400 python tools/convergence_run.py $LEG --epochs 72 \
  --multistep_k 4 --multistep_discount 0.6 \
  --multistep_feedback_noise 0.1 --fidelity_every 12 --path /tmp/r4legE

# 10. VAE remedy depth: deeper decoder + latent sweep
run vae_deep 7200 python tools/layout_convergence.py --families vae \
  --epochs 144 --size 64 --free_bits 0.03 --kl_cycle 400 \
  --bg_weight 0.15 --capacity_max 40 --dec_refines 2 --path /tmp/r4vae_deep
run vae_lat64 7200 python tools/layout_convergence.py --families vae \
  --epochs 144 --size 64 --free_bits 0.03 --kl_cycle 400 \
  --bg_weight 0.15 --capacity_max 40 --latent 64 --path /tmp/r4vae_lat64
run vae_lat16 7200 python tools/layout_convergence.py --families vae \
  --epochs 144 --size 64 --free_bits 0.03 --kl_cycle 400 \
  --bg_weight 0.15 --capacity_max 40 --latent 16 --path /tmp/r4vae_lat16

echo "R4B chain complete ($(date))"
