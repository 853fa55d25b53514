#!/bin/bash
# Round-5 session-2 supplemental queue. The tunnel is fast today
# (vae288 wall 280 s, cvae base 307 s), so the legs dropped from the
# deadline-guarded plan fit after all. Runs concurrently with
# r5_session2b.sh: flock serializes device work, order interleaves.
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock
VAE="--families vae --size 64 --free_bits 0.03 --kl_cycle 400 \
  --bg_weight 0.15 --capacity_max 40"
CKPT=artifacts/flagship/checkpoint/096
COMMON="--hed_weights artifacts/hned_synth.npz --vgg_weights artifacts/vgg_synth.npz"
LEG="$COMMON --ckpt $CKPT --lr 5e-5 --epochs 36 --fidelity_every 12"

gate() {
  if [ "$(date +%s)" -gt "$(date -d "today $1" +%s)" ]; then
    echo "R5S2C SKIP $2 (past $1 launch deadline)"; return 1
  fi; return 0
}
run() {
  local name=$1 tmo=$2; shift 2
  echo "R5S2C start $name ($(date))"
  flock "$LOCK" timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  echo "R5S2C done $name exit $rc ($(date))"
  tail -2 "/tmp/r5_${name}.log"
  return $rc
}

# VAE saturation: latent-64 at double horizon (was still climbing at 288)
gate 10:00 vae576 && run vae576 3600 python tools/layout_convergence.py \
  $VAE --epochs 576 --latent 64 --path /tmp/r5vae576

# dose-response fourth point: latent 128 at the 288-ep horizon
gate 10:10 vae288lat128 && run vae288lat128 3600 \
  python tools/layout_convergence.py \
  $VAE --epochs 288 --latent 128 --path /tmp/r5vae288l128

# fidelity legs S (sigma 0.2) and L (layout_noise 0.05)
gate 10:00 legS && run legS 5400 python tools/convergence_run.py $LEG \
  --multistep_k 4 --multistep_feedback_noise 0.2 --path /tmp/r5legS
gate 10:10 legL && run legL 5400 python tools/convergence_run.py $LEG \
  --multistep_k 4 --multistep_feedback_noise 0.1 \
  --multistep_layout_noise 0.05 --path /tmp/r5legL

echo "R5S2C queue complete ($(date))"
