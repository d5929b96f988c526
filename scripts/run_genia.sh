#!/bin/bash
# GENIA/JNLPBA NER launcher — rebuild of the `src/hug` in_loop.sh usage of
# in_loop_genia.py (random run id, sentence joining) without SLURM.
set -euo pipefail
run_id=$(shuf -i 100000-999999 -n 1)
python -m meant_tpu.cli.in_loop_genia \
  --run_id="$run_id" \
  --model_name="${MODEL_NAME:-biobert}" \
  --num_classes="${NUM_CLASSES:-9}" \
  --join_size="${JOIN_SIZE:-1}" \
  --num_epochs="${NUM_EPOCHS:-10}" \
  --learning_rate="${LR:-5e-5}" \
  --train_batch_size="${BATCH:-16}" \
  "$@"
