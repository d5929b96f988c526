#!/bin/bash
# Classifier training launcher — rebuild of the reference's run_in_loop.sh
# (random 6-digit run_id, `run_in_loop.sh:6-31`) without SLURM: the TPU slice
# is addressed through the jax mesh, not a scheduler GPU grant.
set -euo pipefail
run_id=$(shuf -i 100000-999999 -n 1)
python -m meant_tpu.cli.in_loop_train \
  --run_id="$run_id" \
  --model_name="${MODEL_NAME:-meant}" \
  --num_encoders="${NUM_ENCODERS:-12}" \
  --num_epochs="${NUM_EPOCHS:-10}" \
  --learning_rate="${LR:-5e-5}" \
  --train_batch_size="${BATCH:-16}" \
  --dataset="${DATASET:-Tempstock}" \
  --early_stopping=true \
  "$@"
