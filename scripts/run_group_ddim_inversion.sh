#!/usr/bin/env bash
# Stage 1: group DDIM inversion (same surface as the reference's
# scripts/run_group_ddim_inversion.sh).
set -euo pipefail
CONFIGS_JSON=${1:?usage: run_group_ddim_inversion.sh <group_config.json> [checkpoint]}
CHECKPOINT=${2:-./checkpoints/i2vgen-xl}
python -m mvoc_tpu.cli.inverse \
  --template_config configs/group_inversion/template.yaml \
  --configs_json "$CONFIGS_JSON" \
  --checkpoint "$CHECKPOINT"
