#!/bin/bash
#SBATCH -J nanoranger_5p10XGEX
#SBATCH -c 8
#SBATCH --mem=32G
#SBATCH -t 1:00:00
#SBATCH -o nanoranger_5p10XGEX_%A.out
# one TPU host (e.g. --partition=tpu --gres=tpu:v5e-8 per site config)
# usage: sbatch pipeline_tpu_5p10XGEX.sh INFILE OUTDIR SAMPLE TRNS_REF [GENOME] [BARCODES]
exec "$(dirname "$0")/_common.sh" 5p10XGEX "$@"
