#!/bin/bash
#SBATCH -J nanoranger_3p10XTCR
#SBATCH -c 8
#SBATCH --mem=32G
#SBATCH -t 1:00:00
#SBATCH -o nanoranger_3p10XTCR_%A.out
# one TPU host (e.g. --partition=tpu --gres=tpu:v5e-8 per site config)
# usage: sbatch pipeline_tpu_3p10XTCR.sh INFILE OUTDIR SAMPLE TRNS_REF [GENOME] [BARCODES]
exec "$(dirname "$0")/_common.sh" 3p10XTCR "$@"
