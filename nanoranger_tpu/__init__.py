"""nanoranger-tpu: a TPU-native long-read single-cell / spatial transcriptomics engine.

A from-scratch reimplementation of the capabilities of `mehdiborji/nanoranger`
(long-read 10x/Slide-seq barcode+UMI extraction, transcriptome-first subread
deconcatenation, aligner-based barcode matching, genotyping/clonotype/count
outputs), redesigned TPU-first:

- All hot compute (transcriptome seed-chain-extend alignment, adapter motif
  edit-distance scanning, whitelist Smith-Waterman barcode matching, UMI
  dedup/counting) runs as JAX/XLA + Pallas kernels on fixed-shape int8/int32
  tensors.
- The reference's file-glued process boundaries (minimap2 | STAR | samtools |
  seqkit subprocesses) are replaced by a single jitted device pipeline; only
  boundary artifacts (fastq/fasta/SAM/BAM/csv/mtx) are materialized on host.
- Scale-out is a `jax.sharding.Mesh`: reads are data-parallel sharded, the
  barcode whitelist is model-parallel sharded with an argmax all-reduce,
  and count tensors merge with `psum` — replacing the reference's
  seqkit-split + multiprocessing.Pool + `cat`/JSON-merge runtime.

Layout:
  chemistry   — declarative ChemistrySpec registry (all per-mode constants)
  io          — fastq/fasta/SAM-BAM/whitelist host IO, base encoding
  ops         — device kernels (edit distance, SW rescore, k-mer screen, chain)
  align       — minimizer index + seed-chain-extend aligner
  stages      — decon, barcode matching, dedup/count, tagging, clones
  parallel    — mesh construction and sharded pipeline steps
  pipeline    — CLI entry point (mode dispatch compatible with the reference)
"""

__version__ = "0.1.0"
