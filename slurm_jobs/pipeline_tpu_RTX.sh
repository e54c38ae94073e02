#!/bin/bash
#SBATCH -J nanoranger_RTX
#SBATCH -c 8
#SBATCH --mem=32G
#SBATCH -t 1:00:00
#SBATCH -o nanoranger_RTX_%A.out
# one TPU host (e.g. --partition=tpu --gres=tpu:v5e-8 per site config)
# usage: sbatch pipeline_tpu_RTX.sh INFILE OUTDIR SAMPLE TRNS_REF [GENOME] [BARCODES]
exec "$(dirname "$0")/_common.sh" RTX "$@"
