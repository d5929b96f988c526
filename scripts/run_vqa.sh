#!/bin/bash
# VQA transfer launcher (reference: run_vqa.sh).
set -euo pipefail
run_id=$(shuf -i 100000-999999 -n 1)
python -m meant_tpu.cli.vqa --run_id="$run_id" \
  --model_name="${MODEL_NAME:-meant_vqa}" --num_epochs="${NUM_EPOCHS:-10}" "$@"
