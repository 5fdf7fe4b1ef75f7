#!/bin/bash
# SLURM wrapper for MULTI-HOST mrijax training — the analog of the
# reference's job_submission_scripts/training_job_DDP.sh (torchrun
# --nproc_per_node=N + dist.init_process_group("nccl")).
#
# TPU-native design: there is no torchrun. One Python process per host
# calls jax.distributed.initialize (via `mrijax train --coordinator ...`),
# after which jax.devices() spans every host and the SAME SPMD program
# runs unchanged — XLA inserts ICI/DCN collectives from the shardings.
# Per-process data sharding is the loader's job (mrijax/data/loader.py
# `_local_rows`, the DistributedSampler analog), proven against real
# process boundaries by tests/test_multiprocess_dcn.py.
#
# Usage:
#   sbatch scripts/training_job_multihost.sh <preset|config.json> [cli args...]
# or manually on N hosts (host 0's address as coordinator):
#   MRIJAX_COORD=host0:12355 MRIJAX_NPROCS=2 MRIJAX_PROC_ID=<rank> \
#     scripts/training_job_multihost.sh <preset|config.json>
#
# On Cloud TPU pods, skip the coordinator plumbing entirely: run
# `mrijax train ...` on every worker and jax.distributed auto-discovers
# the topology from the TPU runtime (MRIJAX_MULTIHOST=1 forces the init
# call without explicit flags).
#SBATCH --job-name=mrijax-train-mh
#SBATCH --time=24:00:00
#SBATCH --ntasks-per-node=1
#SBATCH --signal=SIGUSR1@600
#SBATCH --output=/dev/null

set -euo pipefail

ARG1="${1:?usage: training_job_multihost.sh <preset|config.json> [cli args...]}"
shift || true

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_DIR="$(dirname "$SCRIPT_DIR")"
JOB_ID="${SLURM_JOB_ID:-$(date +%s)}"

# rank / world-size / coordinator: SLURM first, explicit env second
if [[ -n "${SLURM_PROCID:-}" ]]; then
  PROC_ID="$SLURM_PROCID"
  NPROCS="${SLURM_NTASKS:-1}"
  COORD_HOST="$(scontrol show hostnames "$SLURM_JOB_NODELIST" | head -n1)"
  COORD="${COORD_HOST}:${MRIJAX_COORD_PORT:-12355}"
else
  PROC_ID="${MRIJAX_PROC_ID:?set MRIJAX_PROC_ID (rank) outside SLURM}"
  NPROCS="${MRIJAX_NPROCS:?set MRIJAX_NPROCS (world size) outside SLURM}"
  COORD="${MRIJAX_COORD:?set MRIJAX_COORD (host0:port) outside SLURM}"
fi

LOG_DIR="$SCRIPT_DIR/logs/train/$JOB_ID"
mkdir -p "$LOG_DIR"
cd "$REPO_DIR"

if [[ "$ARG1" == *.json ]]; then
  CFG_ARGS=(--config "$ARG1")
else
  CFG_ARGS=(--preset "$ARG1")
fi

echo "[multihost] rank $PROC_ID/$NPROCS coordinator=$COORD logs=$LOG_DIR"

# every process runs the identical command; only checkpoint/metric WRITES
# are rank-0-gated inside the library (orbax single-writer, loader shards)
exec python -m mrijax.cli train "${CFG_ARGS[@]}" \
  --coordinator "$COORD" --num-processes "$NPROCS" --process-id "$PROC_ID" \
  "$@" \
  > "$LOG_DIR/${JOB_ID}_p${PROC_ID}.out" 2> "$LOG_DIR/${JOB_ID}_p${PROC_ID}.err"
