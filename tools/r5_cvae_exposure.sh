#!/bin/bash
# CVAE anti-drift campaign (VERDICT r4 #5): BASELINE config #3's full
# operating point (256px, 16-frame autoregressive rollout, latent 64).
# Round-4 baseline at this spec: val mIoU 0.7834, prior-sample rollout
# per-step tail ...0.050 0.049 0.048 (floor by ~step 12).
#
# Legs (matched-compute A/B, the flagship campaign protocol):
#   base  36-ep single-step CVAE           (reproduces the r4 baseline)
#   E     +12-ep K=3 exposure finetune     (weights-only warm start,
#                                           lr 5e-5 — the proven
#                                           objective-switch recipe)
#   EN    +12-ep K=3 + layout_noise 0.05   (the categorical noise lever)
#   ctl   +12-ep single-step at lr 5e-5    (control: same extra compute,
#                                           no exposure objective)
#
#   bash tools/r5_cvae_exposure.sh [legs...]   # default: base E EN ctl
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock
BASE_CKPT=/tmp/r5cvae_base/cvae/checkpoint/036
SPEC="--families cvae --size 256 --rollout_frames 16 --latent 64 --bs 16"
FT="$SPEC --ckpt $BASE_CKPT --lr 5e-5 --epochs 12"

run() {
  local name=$1 tmo=$2; shift 2
  echo "CVX start $name ($(date))"
  flock "$LOCK" timeout "$tmo" "$@" > "/tmp/r5cvx_${name}.log" 2>&1
  local rc=$?
  echo "CVX done $name exit $rc ($(date))"
  tail -4 "/tmp/r5cvx_${name}.log"
  return $rc
}

for leg in "${@:-base E EN ctl}"; do
  case $leg in
    base) run base 7200 python tools/layout_convergence.py $SPEC \
            --epochs 36 --path /tmp/r5cvae_base \
            || { echo "CVX ABORT: base failed"; exit 1; } ;;
    E)  run legE 5400 python tools/layout_convergence.py $FT \
          --multistep_k 3 --path /tmp/r5cvae_k3 ;;
    EN) run legEN 5400 python tools/layout_convergence.py $FT \
          --multistep_k 3 --multistep_layout_noise 0.05 \
          --path /tmp/r5cvae_k3n ;;
    ctl) run legCTL 5400 python tools/layout_convergence.py $FT \
          --path /tmp/r5cvae_ctl ;;
    *) echo "unknown leg $leg" ;;
  esac
done
echo "CVX campaign complete ($(date))"
