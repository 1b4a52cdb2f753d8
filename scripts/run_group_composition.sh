#!/usr/bin/env bash
# Stage 2: multi-object composition (same surface as the reference's
# scripts/run_group_composition.sh).
set -euo pipefail
CONFIGS_JSON=${1:?usage: run_group_composition.sh <group_config.json> [checkpoint]}
CHECKPOINT=${2:-./checkpoints/i2vgen-xl}
python -m mvoc_tpu.cli.composite \
  --template_config configs/group_composite/template.yaml \
  --configs_json "$CONFIGS_JSON" \
  --checkpoint "$CHECKPOINT"
