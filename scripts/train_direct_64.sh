#!/usr/bin/env bash
# Direct 64³ baseline training (ref: start_direct_training.sh).
# Sanity gates from the reference: PSNR > 15 dB by epoch 3, > 20 dB by epoch 10.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m hybrid_vit_cascade_tpu.cli train --config configs/direct_64.json "$@"
