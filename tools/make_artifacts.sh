#!/bin/bash
# Regenerate every durable artifact the demos/quality runs depend on, into
# artifacts/ (gitignored — *.npz — but the directory lives in the repo tree,
# which DOES survive session restarts; /tmp does not).
#
#   bash tools/make_artifacts.sh [--quick]
#
# Produces:
#   artifacts/hned_synth.npz   pretrained HED edge detector (class-balanced
#                              BCE on analytic edges; tools/pretrain_hned.py)
#   artifacts/vgg_synth.npz    pretrained VGG19-relu4_4 feature net
#                              (tools/pretrain_vgg.py)
#   artifacts/flagship/        convergence run with the pretrained loss:
#                              checkpoints (epoch files + latest), logs, TB
#
# --quick: 4-epoch smoke instead of the 48-epoch quality run.
set -e
cd "$(dirname "$0")/.."
mkdir -p artifacts

EPOCHS=48
if [ "$1" = "--quick" ]; then EPOCHS=4; fi

if [ ! -f artifacts/hned_synth.npz ]; then
  python tools/pretrain_hned.py --out artifacts/hned_synth.npz
fi
if [ ! -f artifacts/vgg_synth.npz ]; then
  python tools/pretrain_vgg.py --out artifacts/vgg_synth.npz
fi
python tools/convergence_run.py --epochs "$EPOCHS" \
  --hed_weights artifacts/hned_synth.npz \
  --vgg_weights artifacts/vgg_synth.npz \
  --path artifacts/flagship
