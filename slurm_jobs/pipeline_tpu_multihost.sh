#!/bin/bash
#SBATCH -J nanoranger_mh
#SBATCH -c 8
#SBATCH --mem=32G
#SBATCH -t 2:00:00
#SBATCH -o nanoranger_mh_%A_%a.out
# Multi-host data parallelism (docs/MULTICHIP.md): submit as an array —
#   sbatch --array=0-(N-1) pipeline_tpu_multihost.sh MODE INFILE OUTDIR SAMPLE TRNS [GENOME] [BARCODES]
# Each array task processes one input shard on its own TPU host; shard
# artifacts carry the task suffix; shard fastqs come from
# nanoranger_tpu.tools.split_fastq (deterministic order — the
# reference's sorted-cat analogue).
set -euo pipefail
MODE=$1; INFILE=$2; OUTDIR=$3; SAMPLE=$4; shift 4
N=${SLURM_ARRAY_TASK_COUNT:-1}
I=${SLURM_ARRAY_TASK_ID:-0}
REPO=${NANORANGER_REPO:-$(dirname "$(dirname "$(readlink -f "$0")")")}
STEM=$(basename "$INFILE"); STEM=${STEM%.gz}; STEM=${STEM%.fastq}
SHARD="$OUTDIR/shards/${STEM}.part_$((I+1)).fastq.gz"
if [ ! -f "$SHARD" ]; then
  mkdir -p "$OUTDIR/shards"
  python -m nanoranger_tpu.tools.split_fastq "$INFILE" "$N" "$OUTDIR/shards"
fi
exec "$(dirname "$0")/_common.sh" "$MODE" "$SHARD" "$OUTDIR" \
     "${SAMPLE}_part$((I+1))" "$@"
