#!/bin/bash
# tweetner7 NER launcher — rebuild of `src/hug/run_tweet7.sh` (random run
# id, 9-class default, warmup-scheduled token classification) without SLURM.
set -euo pipefail
run_id=$(shuf -i 100000-999999 -n 1)
python -m meant_tpu.cli.tweet7 \
  --run_id="$run_id" \
  --model_name="${MODEL_NAME:-bert_ner}" \
  --num_classes="${NUM_CLASSES:-9}" \
  --num_epochs="${NUM_EPOCHS:-10}" \
  --learning_rate="${LR:-5e-5}" \
  --train_batch_size="${BATCH:-16}" \
  --learning_rate_scheduler_type="${LRST:-linear_warmup}" \
  --lr_warmup_step_ratio="${WARMUP:-0.1}" \
  "$@"
