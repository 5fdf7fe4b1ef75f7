#!/bin/bash
# Single-chip generation/visualization job (reference: visualization_jobs.sh).
# Usage: sbatch scripts/sampling_job.sh <run_dir> [sample cli args...]
#SBATCH --job-name=mrijax-sample
#SBATCH --time=04:00:00
#SBATCH --output=/dev/null

set -euo pipefail
RUN_DIR="${1:?run dir}"
shift || true

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_DIR="$(dirname "$SCRIPT_DIR")"
JOB_ID="${SLURM_JOB_ID:-$(date +%s)}"
LOG_DIR="$SCRIPT_DIR/logs/sample/$JOB_ID"
mkdir -p "$LOG_DIR"
cd "$REPO_DIR"

exec python -m mrijax.cli sample --run-dir "$RUN_DIR" "$@" \
  > "$LOG_DIR/$JOB_ID.out" 2> "$LOG_DIR/$JOB_ID.err"
