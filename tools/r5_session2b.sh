#!/bin/bash
# Round-5 session-2 revised queue (takes over after legG; the original
# r5_session2.sh order could not fit the CVAE campaign before the round
# boundary). Breadth over depth: close VERDICT #6 (VAE 288-ep endpoint)
# and #5 (CVAE anti-drift) fully, then spend whatever window remains on
# one more #3 fidelity leg. Every stage has a launch deadline so nothing
# straddles the round boundary (the r4 failure mode: a leg running at
# the boundary wedged the driver bench).
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock
CVAE_BASE=/tmp/r5cvae_base/cvae/checkpoint/036
SPEC="--families cvae --size 256 --rollout_frames 16 --latent 64 --bs 16"
FT="$SPEC --ckpt $CVAE_BASE --lr 5e-5 --epochs 12"

# launch deadlines, seconds since epoch (UTC today)
today() { date -d "today $1" +%s; }

gate() { # gate HH:MM name  -> 0 if we may still launch
  if [ "$(date +%s)" -gt "$(today "$1")" ]; then
    echo "R5S2B SKIP $2 (past $1 launch deadline)"; return 1
  fi; return 0
}

run() {
  local name=$1 tmo=$2; shift 2
  echo "R5S2B start $name ($(date))"
  flock "$LOCK" timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  echo "R5S2B done $name exit $rc ($(date))"
  tail -3 "/tmp/r5_${name}.log"
  return $rc
}

# ---- VERDICT #6: plain-VAE 288-epoch latent-64 endpoint ---------------
gate 09:45 vae288 && run vae288 3600 python tools/layout_convergence.py \
  --families vae --epochs 288 --size 64 --free_bits 0.03 --kl_cycle 400 \
  --bg_weight 0.15 --capacity_max 40 --latent 64 --path /tmp/r5vae288

# ---- VERDICT #5: CVAE anti-drift at config #3's operating point -------
if gate 09:55 cvae_base; then
  run cvae_base 5400 python tools/layout_convergence.py $SPEC \
    --epochs 36 --path /tmp/r5cvae_base
  if [ -d "$CVAE_BASE" ]; then
    # persistence policy: pack the expensive base the moment it exists
    python tools/persist_artifacts.py pack --ckpt "$CVAE_BASE" \
      --out artifacts_store/cvae256_036.npz || true
    gate 10:20 cvae_E && run cvae_E 3600 python tools/layout_convergence.py \
      $FT --multistep_k 3 --path /tmp/r5cvae_k3
    gate 10:25 cvae_EN && run cvae_EN 3600 python tools/layout_convergence.py \
      $FT --multistep_k 3 --multistep_layout_noise 0.05 --path /tmp/r5cvae_k3n
    gate 10:30 cvae_ctl && run cvae_ctl 2700 python tools/layout_convergence.py \
      $FT --path /tmp/r5cvae_ctl
  else
    echo "R5S2B: cvae base checkpoint missing — skipping finetune legs"
  fi
fi

# ---- VERDICT #3: one more fidelity leg in whatever window remains -----
CKPT=artifacts/flagship/checkpoint/096
COMMON="--hed_weights artifacts/hned_synth.npz --vgg_weights artifacts/vgg_synth.npz"
LEG="$COMMON --ckpt $CKPT --lr 5e-5 --epochs 36 --fidelity_every 12"
if gate 09:40 legC; then
  run legC1 3600 python tools/convergence_run.py $COMMON \
    --ckpt $CKPT --lr 5e-5 --epochs 12 --scheduled_sampling 0.5 \
    --scheduled_ramp 12 --path /tmp/r5legC1
  [ -d /tmp/r5legC1/checkpoint/012 ] && run legC2 5400 \
    python tools/convergence_run.py $LEG \
    --multistep_k 4 --multistep_feedback_noise 0.1 \
    --ckpt /tmp/r5legC1/checkpoint/012 --path /tmp/r5legC2
elif gate 10:10 legS; then
  run legS 5400 python tools/convergence_run.py $LEG \
    --multistep_k 4 --multistep_feedback_noise 0.2 --path /tmp/r5legS
fi

# ---- final health check: bench once more, warm, before the boundary ---
gate 10:50 finalbench && { timeout 1200 python bench.py \
  > /tmp/bench_final.json 2>/tmp/bench_final.err; cat /tmp/bench_final.json; }

echo "R5S2B queue complete ($(date))"
