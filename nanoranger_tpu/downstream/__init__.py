"""Downstream analytics over the CB/UB/XT-tagged BAM — htslib-free ports of
the reference's scripts/downstream/* and scripts/store_nanopore_stats.py."""
