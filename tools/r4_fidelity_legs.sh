#!/bin/bash
# Round-4 fidelity campaign, stage B (VERDICT r3 #2 + #8): long legs from
# the shared 96-epoch flagship base (artifacts/flagship/checkpoint/096,
# rebuilt by tools/r4_hw_queue.sh), weights-only warm start at lr 5e-5 —
# the proven objective-switch recipe.
#
#   bash tools/r4_fidelity_legs.sh [legs...]   # default: R F E
#
# Legs (held-out per-step rollout mIoU logged every 12 epochs in-training
# via --fidelity_every, final table printed at the end):
#   R   scheduled-sampling RAMP 0->0.5 over 12 epochs, 12 ep (VERDICT #8;
#       r3 leg D used ramp 4 — this isolates the slow-ramp variant)
#   F   K=4 + feedback noise 0.1 (r3 leg C, the best 12-ep mean lever),
#       72 epochs — was never run long
#   E   K=4 + discount 0.6 + noise 0.1 (r3 leg E recipe), 72 epochs —
#       leg E was still climbing at its 36-epoch point (0.457 mean)
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock
CKPT=artifacts/flagship/checkpoint/096
COMMON="--hed_weights artifacts/hned_synth.npz \
  --vgg_weights artifacts/vgg_synth.npz --ckpt $CKPT --lr 5e-5"

run_leg() {
  local name=$1 tmo=$2; shift 2
  echo "R4L start $name ($(date))"
  flock "$LOCK" timeout "$tmo" python tools/convergence_run.py $COMMON \
    --path "/tmp/r4leg${name}" "$@" > "/tmp/r4leg${name}.log" 2>&1
  echo "R4L done $name exit $? ($(date))"
  grep -E "FINAL|ROLLOUT|fidelity" "/tmp/r4leg${name}.log" | tail -4
}

for leg in "${@:-R F E}"; do
  case $leg in
    R) run_leg R 3600 --epochs 12 --scheduled_sampling 0.5 \
         --scheduled_ramp 12 ;;
    F) run_leg F 10800 --epochs 72 --multistep_k 4 \
         --multistep_feedback_noise 0.1 --fidelity_every 12 ;;
    E) run_leg E 10800 --epochs 72 --multistep_k 4 \
         --multistep_discount 0.6 --multistep_feedback_noise 0.1 \
         --fidelity_every 12 ;;
    *) echo "unknown leg $leg" ;;
  esac
done
echo "R4L stage B complete ($(date))"
