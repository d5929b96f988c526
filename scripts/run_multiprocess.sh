#!/bin/bash
# Multi-process (pod-rehearsal) launcher: spawns NUM_PROCESSES local workers
# under jax.distributed against a localhost coordinator — the same topology
# a SLURM/GKE pod launcher provides one process per host on real fleets
# (the reference's launcher layer is single-site SLURM, `run.sh`; it has no
# multi-host story — SURVEY.md §2.7).
#
# Modes (passed through): --trainer [--fsdp] [--ckpt_dir DIR] | --hybrid |
# --ring | (none: minimal DP step). Each worker prints its replicated
# loss; all must agree.
set -euo pipefail
NUM_PROCESSES="${NUM_PROCESSES:-2}"
LOCAL_DEVICES="${LOCAL_DEVICES:-4}"
PORT="${PORT:-$((20000 + RANDOM % 20000))}"
HERE="$(cd "$(dirname "$0")" && pwd)"

pids=()
for ((i = 0; i < NUM_PROCESSES; i++)); do
  JAX_PLATFORMS=cpu python "$HERE/multiprocess_worker.py" \
    --process_id="$i" \
    --num_processes="$NUM_PROCESSES" \
    --local_devices="$LOCAL_DEVICES" \
    --coordinator="127.0.0.1:$PORT" \
    "$@" &
  pids+=($!)
done
rc=0
for pid in "${pids[@]}"; do
  wait "$pid" || rc=$?
done
exit "$rc"
