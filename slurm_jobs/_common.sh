#!/bin/bash
# Shared launcher body for the nanoranger-tpu SLURM jobs (the engine's
# analogue of the reference's slurm_jobs/pipeline_O2_*.sh, which pinned
# 16-20 CPU cores per mode). Here a job runs one TPU host: JAX sees the
# host's chips; --data_shards spreads streamed batches across them and
# --wl_shards shards the whitelist match (jax.sharding mesh).
#
# args: MODE INFILE OUTDIR SAMPLE TRNS_REF [GENOME_REF] [BARCODES]
set -euo pipefail
MODE=$1; INFILE=$2; OUTDIR=$3; SAMPLE=$4; TRNS=$5
GENOME=${6:-}; BARCODES=${7:-}
REPO=${NANORANGER_REPO:-$(dirname "$(dirname "$(readlink -f "$0")")")}
CHIPS=${NANORANGER_CHIPS:-$(python -c 'import jax; print(len(jax.devices()))')}
ARGS=(--mode "$MODE" --infile "$INFILE" --outdir "$OUTDIR" \
      --expname "$SAMPLE" --trns_ref "$TRNS" --data_shards "$CHIPS")
[ -n "$GENOME" ] && ARGS+=(--genome_ref "$GENOME")
[ -n "$BARCODES" ] && ARGS+=(--barcodes "$BARCODES")
echo "inputfq = $INFILE"; echo "outdir = $OUTDIR"; echo "sample = $SAMPLE"
echo "chips = $CHIPS"
cd "$REPO" && exec python -m nanoranger_tpu.pipeline "${ARGS[@]}"
