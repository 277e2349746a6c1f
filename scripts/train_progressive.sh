#!/usr/bin/env bash
# Progressive cascade training, stage-by-stage with freezing
# (ref: launch_progressive_1gpu.sh / train_progressive_4gpu.py).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m hybrid_vit_cascade_tpu.cli train --config configs/progressive_cascade.json "$@" \
  2>&1 | tee "progressive_training_$(date +%Y%m%d_%H%M%S).log"
