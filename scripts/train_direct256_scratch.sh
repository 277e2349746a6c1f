#!/usr/bin/env bash
# Direct 256³ B200-style from-scratch training (ref: run_direct256_scratch.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m hybrid_vit_cascade_tpu.cli train --config configs/direct256_b200.json "$@"
