#!/bin/bash
# Epoch-chained training — rebuild of the reference's checkpoint.sh
# (`checkpoint.sh:22-43`: one job per epoch chained with `-d afterany` so a
# crashed epoch doesn't kill the sequence, final test job at the end).
# Without SLURM the chain is a loop that tolerates per-epoch failures and
# resumes from the saved state via --epoch.
set -uo pipefail
EPOCHS="${EPOCHS:-10}"
run_id=$(shuf -i 100000-999999 -n 1)
for epoch in $(seq 0 $((EPOCHS - 1))); do
  python -m meant_tpu.cli.in_loop_train \
    --run_id="$run_id" --epoch="$epoch" --num_epochs=1 \
    --test_model=false "$@" || echo "epoch $epoch failed; continuing"
done
# final test pass
python -m meant_tpu.cli.in_loop_train \
  --run_id="$run_id" --epoch="$EPOCHS" --num_epochs=0 \
  --test_model=true "$@"
