#!/usr/bin/env bash
# Checkpoint-driven inference + NIfTI/PNG export (ref: run_inference.sh).
# Usage: scripts/run_inference.sh <checkpoint_dir> [extra cli args...]
set -euo pipefail
cd "$(dirname "$0")/.."
CKPT="${1:?usage: run_inference.sh <checkpoint_dir> [args]}"
shift
python -m hybrid_vit_cascade_tpu.cli infer --checkpoint "$CKPT" --output inference_results "$@"
