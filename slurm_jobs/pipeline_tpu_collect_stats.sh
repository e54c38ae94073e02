#!/bin/bash
#SBATCH -J nanoranger_stats
#SBATCH -c 8
#SBATCH --mem=16G
#SBATCH -t 0:30:00
#SBATCH -o nanoranger_stats_%A.out
# run-QC stats (reference slurm_jobs/pipeline_O2_collect_stats.sh →
# scripts/store_nanopore_stats.py): per-read length/quality/channel/time
# usage: sbatch pipeline_tpu_collect_stats.sh INFILE OUTCSV
set -euo pipefail
REPO=${NANORANGER_REPO:-$(dirname "$(dirname "$(readlink -f "$0")")")}
cd "$REPO" && exec python -m nanoranger_tpu.downstream.read_stats "$1" "$2"
