from . import encode, fasta, fastq, whitelist  # noqa: F401
