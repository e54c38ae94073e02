"""Regenerate tests/goldens/real_samples.json.

Runs every bundled reference sample fastq (first N_READS reads) through
the CLI pipeline on CPU and snapshots artifact-level counts — the
real-data parity corpus (reference sample_fastq/ + README.md:60-147).
Run:  JAX_PLATFORMS=cpu python tools/gen_real_goldens.py
"""

from __future__ import annotations

import gzip
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Full-corpus parity (round-4 VERDICT #5): cover EVERY read of every
# bundled sample (~4,000-5,044 each — the whole corpus the reference
# ships). 10**9 means "no prefix cut"; override with
# NANORANGER_GOLDEN_READS for quick local regens.
N_READS = int(os.environ.get("NANORANGER_GOLDEN_READS", 10**9))

# (sample fastq, mode, trns_ref, genome_ref, barcodes) — pairings from the
# reference README.md:60-147
CONFIGS = [
    ("K562_Kasumi1_BCRABL1_RUNX1_RUNX1T1", "5p10XGEX",
     "RUNX1_RUNX1T1_ABL1_BCR.fa", "RUNX1_RUNX1T1_ABL1_BCR.fa",
     "737K-august-2016.txt.gz"),
    ("1022_DNMT3A_RUNX1_SF3B1", "5p10XGEX",
     "panel_MT_trns.fa", "MT_chr.fa", "737K-august-2016.txt.gz"),
    ("1026_mtDNA_ASXL1_NRAS_SF3B1", "5p10XGEX",
     "panel_MT_trns.fa", "MT_chr.fa", "737K-august-2016.txt.gz"),
    ("97_6_CAR", "5p10XGEX",
     "CAR_CD28.fa", "CAR_CD28.fa", "737K-august-2016.txt.gz"),
    ("TCR3", "5p10XTCR",
     "TR_V_human.fa", None, "737K-august-2016.txt.gz"),
    ("slideseq_XCR", "3pXCR_slideseq",
     "XR_C_mouse.fa", None, "slideseq.matched.barcodes.tsv.gz"),
]


def write_prefix(src: str, dst: str, n_reads: int):
    with gzip.open(src, "rt") as f, gzip.open(dst, "wt") as g:
        for i, line in enumerate(f):
            if i >= 4 * n_reads:
                break
            g.write(line)


def run_one(sample, mode, trns, genome, bcs, outdir):
    from nanoranger_tpu.pipeline import run_pipeline
    data = os.path.join(REPO, "data")
    src = os.path.join(data, "samples", sample + ".fastq.gz")
    infile = os.path.join(outdir, "in.fastq.gz")
    write_prefix(src, infile, N_READS)
    run_pipeline(mode, infile, outdir, "t",
                 trns_ref=os.path.join(data, trns),
                 genome_ref=os.path.join(data, genome) if genome else None,
                 barcodes=os.path.join(data, bcs), batch_size=1024)
    return collect(outdir, "t", mode)


def _count_fastq(path):
    n, tot = 0, 0
    with gzip.open(path, "rt") as f:
        for i, line in enumerate(f):
            if i % 4 == 1:
                n += 1
                tot += len(line.strip())
    return n, tot


def collect(outdir, s, mode):
    import pandas as pd
    g = {}
    sub_kind = "VDJ" if mode in ("3pXCR_slideseq", "3p10XTCR",
                                 "3p10XTCR_nuc") else "deconcat"
    n_sub, sub_bases = _count_fastq(f"{outdir}/{s}_{sub_kind}.fastq.gz")
    g["n_subreads"] = n_sub
    g["subread_bases"] = sub_bases
    df = pd.read_csv(f"{outdir}/{s}_assignments.csv.gz",
                     keep_default_na=False)
    g["n_candidates"] = int(len(df))
    g["n_accepted"] = int((df.status == 0).sum())
    acc = df[df.status == 0]
    g["n_distinct_bc"] = int(acc.bc.nunique())
    g["umi_len_mode"] = (int(acc.umi.str.len().mode()[0]) if len(acc)
                         else 0)
    if mode == "5p10XGEX":
        from nanoranger_tpu.io.bam import read_bam
        _, _, it = read_bam(f"{outdir}/{s}_genome_tagged.bam")
        n = 0
        for r in it:
            n += 1
        g["n_tagged_bam"] = n
        dd = pd.read_csv(f"{outdir}/{s}_bcumi_dedup.csv")
        g["n_dedup_rows"] = int(len(dd))
    if mode == "5p10XTCR":
        cl = pd.read_csv(f"{outdir}/{s}_clones_filtered.csv")
        g["n_clones"] = int(len(cl))
        cb = pd.read_csv(f"{outdir}/{s}_clone_bcumi.csv.gz")
        g["n_clone_bcumi"] = int(len(cb))
    if mode == "3pXCR_slideseq":
        eds = pd.read_csv(f"{outdir}/{s}_eds_names.csv.gz")
        g["n_eds_rows"] = int(len(eds))
    with open(f"{outdir}/{s}_runstats.json") as f:
        rs = json.load(f)
    g["runstats_stages"] = [r["stage"] for r in rs["stages"]]
    return g


def main():
    import sys
    out = {"n_reads": N_READS, "samples": {}}
    cfgs = CONFIGS
    path = os.path.join(REPO, "tests", "goldens", "real_samples.json")
    if len(sys.argv) > 1:          # subset regen: merge into existing
        want = set(sys.argv[1].split(","))
        cfgs = [c for c in CONFIGS if c[0] in want]
        if os.path.isfile(path):
            prev = json.load(open(path))
            if prev.get("n_reads") == N_READS:
                out["samples"].update(prev.get("samples", {}))
    for sample, mode, trns, genome, bcs in cfgs:
        with tempfile.TemporaryDirectory() as d:
            print(f"== {sample} ({mode})", flush=True)
            out["samples"][sample] = {"mode": mode,
                                      **run_one(sample, mode, trns, genome,
                                                bcs, d)}
            print(json.dumps(out["samples"][sample]), flush=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
