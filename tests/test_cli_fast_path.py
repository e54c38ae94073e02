"""Byte-identity of the fused CLI fast path (stages/cli_step.py) vs the
unfused streamed path, including the >S-chain deferred-read fallback.

The broad identity evidence is tests/test_real_samples.py: its goldens
were frozen from the unfused path and the pipeline now runs the fused
path by default, so all six real samples/modes assert fast == slow at
artifact level. This file adds the cases those samples don't force:
  - synthetic concatemers with more chains than device slots (defer path,
    in-order interleave with neighbors)
  - modes compared artifact-by-artifact in one process (hash equality)
"""

import gzip
import hashlib
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")


def _hash_artifacts(outdir):
    out = {}
    for f in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, f)
        if f.endswith((".pdf", "_runstats.json")) or f.endswith(".tmp"):
            continue  # pdfs embed timestamps; runstats is timings
        if f.endswith(".gz"):
            h = hashlib.sha1(gzip.open(p, "rb").read()).hexdigest()
        else:
            h = hashlib.sha1(open(p, "rb").read()).hexdigest()
        out[f] = h
    return out


def _run_both(mode, infile, tmp_path, **kw):
    from nanoranger_tpu.pipeline import run_pipeline
    dirs = {}
    for tag, no_fast in (("slow", "1"), ("fast", "")):
        out = str(tmp_path / tag)
        os.environ["NANORANGER_NO_FAST"] = no_fast
        try:
            run_pipeline(mode, infile, out, "t", **kw)
        finally:
            os.environ.pop("NANORANGER_NO_FAST", None)
        dirs[tag] = out
    return dirs


def _write_fastq(path, reads):
    with gzip.open(path, "wt") as g:
        for name, seq in reads:
            g.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


def test_concatemer_defer_interleave(tmp_path, rng):
    """Reads with more kept chains than fused slots (S=4) reroute through
    the unfused path and interleave in read order — artifacts identical."""
    from nanoranger_tpu.io import fasta
    names, seqs = fasta.read_fasta_encoded(
        os.path.join(DATA, "RUNX1_RUNX1T1_ABL1_BCR.fa"))
    alpha = "ACGT"

    def seg(rid, lo, n):
        return "".join(alpha[c] for c in np.asarray(seqs[rid][lo:lo + n]))

    def noisy(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.02:
                continue
            out.append(alpha[rng.integers(4)] if r < 0.06 else ch)
        return "".join(out)

    adapter = "CGCTCTTCCGATCT"
    bc_umi = "AACCGGTTAACCGGTT" + "ACGTACGTAC"
    tso = "TTTCTTATATG"
    reads = []
    # 6-segment concatemer (> S=4 chains) flanked by normal reads
    for i in range(8):
        if i % 3 == 1:
            parts = []
            for k in range(6):
                rid = k % len(seqs)
                parts.append(adapter + bc_umi + tso +
                             noisy(seg(rid, 50, 400)))
            reads.append((f"concat{i}", "".join(parts)))
        else:
            rid = i % len(seqs)
            reads.append((f"norm{i}", adapter + bc_umi + tso +
                          noisy(seg(rid, 100, 600))))
    infile = str(tmp_path / "in.fastq.gz")
    _write_fastq(infile, reads)

    dirs = _run_both("5p10XGEX", infile, tmp_path,
                     trns_ref=os.path.join(DATA, "RUNX1_RUNX1T1_ABL1_BCR.fa"),
                     genome_ref="/nonexistent",
                     barcodes=os.path.join(DATA, "737K-august-2016.txt.gz"),
                     batch_size=8)
    a, b = _hash_artifacts(dirs["slow"]), _hash_artifacts(dirs["fast"])
    assert a == b
    # the concatemers must actually have exercised the defer path
    import json
    rs = json.load(open(os.path.join(dirs["fast"], "t_runstats.json")))
    assert rs["stages"][0].get("deferred_reads", 0) >= 2


@pytest.mark.parametrize("mode,sample,trns,bcs", [
    ("3pXCR_slideseq", "slideseq_XCR", "XR_C_mouse.fa",
     "slideseq.matched.barcodes.tsv.gz"),
    ("5p10XTCR", "TCR3", "TR_V_human.fa", "737K-august-2016.txt.gz"),
])
def test_fast_slow_equal_real(mode, sample, trns, bcs, tmp_path):
    """Artifact-hash equality on a real-sample prefix for the modes with
    the richest host-assembly surface (polyA/eds_names; eds table +
    all-subread emission)."""
    src = os.path.join(DATA, "samples", sample + ".fastq.gz")
    infile = str(tmp_path / "in.fastq.gz")
    with gzip.open(src, "rt") as f, gzip.open(infile, "wt") as g:
        for i, line in enumerate(f):
            if i >= 4 * 300:
                break
            g.write(line)
    dirs = _run_both(mode, infile, tmp_path,
                     trns_ref=os.path.join(DATA, trns),
                     barcodes=os.path.join(DATA, bcs), batch_size=256)
    a, b = _hash_artifacts(dirs["slow"]), _hash_artifacts(dirs["fast"])
    assert a == b


def test_fast_slow_equal_3pgex(tmp_path):
    """3p10XGEX: fused decon without inline matching (data-driven
    whitelist) — raw counts, quads, and the count matrix must be equal."""
    src = os.path.join(DATA, "samples", "1026_mtDNA_ASXL1_NRAS_SF3B1.fastq.gz")
    infile = str(tmp_path / "in.fastq.gz")
    with gzip.open(src, "rt") as f, gzip.open(infile, "wt") as g:
        for i, line in enumerate(f):
            if i >= 4 * 300:
                break
            g.write(line)
    dirs = _run_both("3p10XGEX", infile, tmp_path,
                     trns_ref=os.path.join(DATA, "panel_MT_trns.fa"),
                     batch_size=256)
    a, b = _hash_artifacts(dirs["slow"]), _hash_artifacts(dirs["fast"])
    assert a == b
