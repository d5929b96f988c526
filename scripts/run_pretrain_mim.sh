#!/bin/bash
# MIM pretraining launcher (reference: run_pretrain_mim.sh).
set -euo pipefail
run_id=$(shuf -i 100000-999999 -n 1)
python -m meant_tpu.cli.pretrain_mim --run_id="$run_id" \
  --num_encoders="${NUM_ENCODERS:-12}" --num_epochs="${NUM_EPOCHS:-10}" "$@"
