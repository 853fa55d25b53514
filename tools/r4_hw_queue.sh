#!/bin/bash
# Round-4 hardware chain, stage A: regenerate the durable artifacts that
# did not survive the round boundary (artifacts/ is gitignored), then the
# fidelity-decomposition diagnosis (VERDICT r3 #2, first step).
#
#   bash tools/r4_hw_queue.sh
#
# Strictly serial; every TPU job holds the shared /tmp/vlg_tpu.lock.
# Stage B (the fidelity legs) is launched separately once the
# decomposition table names the channel to push.
set -u
cd "$(dirname "$0")/.."
LOCK=/tmp/vlg_tpu.lock

run() {
  local name=$1 tmo=$2; shift 2
  echo "R4Q start $name ($(date))"
  flock "$LOCK" timeout "$tmo" "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  echo "R4Q done $name exit $rc ($(date))"
  tail -3 "/tmp/r4_${name}.log"
}

mkdir -p artifacts

# 1. pretrained loss artifacts (HNED edge net + VGG19 feature net)
if [ ! -f artifacts/hned_synth.npz ]; then
  run hned 3600 python tools/pretrain_hned.py --out artifacts/hned_synth.npz
fi
if [ ! -f artifacts/vgg_synth.npz ]; then
  run vgg 3600 python tools/pretrain_vgg.py --out artifacts/vgg_synth.npz
fi

# 2. flagship 96-epoch convergence base (same recipe as round 3:
#    48 epochs + resume to 96; mIoU should land ~0.85)
run flagship48 5400 python tools/convergence_run.py --epochs 48 \
  --hed_weights artifacts/hned_synth.npz \
  --vgg_weights artifacts/vgg_synth.npz --path artifacts/flagship
run flagship96 5400 python tools/convergence_run.py --epochs 96 \
  --hed_weights artifacts/hned_synth.npz \
  --vgg_weights artifacts/vgg_synth.npz --path artifacts/flagship \
  --resume latest

# 3. fidelity decomposition on the base checkpoint: which feedback
#    channel (image vs layout) drives the rollout decay?
run decompose 3600 python tools/fidelity_decompose.py \
  --ckpt artifacts/flagship/checkpoint/096 \
  --hed_weights artifacts/hned_synth.npz

echo "R4Q stage A complete ($(date))"
