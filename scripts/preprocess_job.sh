#!/bin/bash
# CPU-only offline preprocessing job (reference: preprocess_job.sh).
# Usage: sbatch scripts/preprocess_job.sh <root_dir> <output_dir> [image_size]
#SBATCH --job-name=mrijax-preprocess
#SBATCH --time=08:00:00
#SBATCH --output=/dev/null

set -euo pipefail
ROOT="${1:?root dir}"
OUT="${2:?output dir}"
SIZE="${3:-128}"

SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
REPO_DIR="$(dirname "$SCRIPT_DIR")"
JOB_ID="${SLURM_JOB_ID:-$(date +%s)}"
LOG_DIR="$SCRIPT_DIR/logs/preprocess/$JOB_ID"
mkdir -p "$LOG_DIR"
cd "$REPO_DIR"

make -C csrc || true  # native decode fast path; falls back to numpy

exec python -m mrijax.cli --platform cpu preprocess \
  --root-dir "$ROOT" --output-dir "$OUT" --image-size "$SIZE" \
  > "$LOG_DIR/$JOB_ID.out" 2> "$LOG_DIR/$JOB_ID.err"
