#!/bin/bash
# VERDICT r2 #1: rollout-fidelity lever A/Bs, each leg a weights-only warm
# start from the SHARED flagship epoch-96 checkpoint at lr 5e-5 (the proven
# objective-switch recipe, BENCH_NOTES "Multi-step BPTT finetune"), 12
# epochs, production config (256px b16 bf16, HNED+VGG pretrained loss).
#
#   bash tools/fidelity_campaign.sh [legs...]   # default: A B C D
#
# Legs:
#   A  multistep K=4 (control; round-2 recipe re-based on this ckpt)
#   B  K=4 + per-step discount 0.6 (up-weights late steps)
#   C  K=4 + feedback noise sigma 0.1
#   D  scheduled sampling p->0.5 over 4 epochs (single-step cost)
# Output: /tmp/leg<X>_*.log — FINAL dict + ROLLOUT FIDELITY per-step mIoU.
set -u
cd "$(dirname "$0")/.."
CKPT=artifacts/flagship/checkpoint/096
COMMON="--epochs 12 --hed_weights artifacts/hned_synth.npz \
  --vgg_weights artifacts/vgg_synth.npz --ckpt $CKPT --lr 5e-5"

run_leg() {
  local name=$1; shift
  echo "=== leg $name: $* ==="
  timeout 3600 python tools/convergence_run.py $COMMON \
    --path /tmp/leg${name} "$@" > /tmp/leg${name}.log 2>&1
  echo "leg $name exit $?"
  grep -E "FINAL|ROLLOUT" /tmp/leg${name}.log
}

for leg in "${@:-A B C D}"; do
  case $leg in
    A) run_leg A --multistep_k 4 ;;
    B) run_leg B --multistep_k 4 --multistep_discount 0.6 ;;
    C) run_leg C --multistep_k 4 --multistep_feedback_noise 0.1 ;;
    D) run_leg D --scheduled_sampling 0.5 --scheduled_ramp 4 ;;
    *) echo "unknown leg $leg" ;;
  esac
done
