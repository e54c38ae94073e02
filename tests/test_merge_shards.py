"""Multi-host shard-output merge (VERDICT r3 missing #2): split a sample
into 2 fastq shards, run the pipeline on each shard outdir, merge with
tools/merge_shards, and require the merged artifact set to equal the
unsharded run — record-identical fastq/fasta/BAM, byte-identical tables.
(The reference merges shards with `cat` + JSON dict-sum, reference
pipeline.py:183-190, utils.py:1419-1431.)"""

import gzip
import os

import numpy as np
import pytest

from nanoranger_tpu.io.encode import decode
from nanoranger_tpu.pipeline import run_pipeline
from nanoranger_tpu.tools.merge_shards import merge_shards
from nanoranger_tpu.tools.split_fastq import split_fastq


@pytest.fixture(scope="module")
def sample(module_rng, tmp_path_factory):
    rng = module_rng
    d = tmp_path_factory.mktemp("ms")
    refs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    trns = d / "panel.fa"
    with open(trns, "w") as f:
        for i, r in enumerate(refs):
            f.write(f">G{i}\n{decode(r)}\n")
    bcs = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(64)})
    wl = d / "wl.txt.gz"
    with gzip.open(wl, "wt") as f:
        f.write("\n".join(bcs) + "\n")
    fq = d / "reads.fastq.gz"
    with gzip.open(fq, "wt") as f:
        for i in range(151):        # odd count: unequal shard sizes
            bc = bcs[i % len(bcs)]
            umi = "".join(rng.choice(list("ACGT"), 10))
            pre = "".join(rng.choice(list("ACGT"), 25))
            gene = decode(refs[i % 2][40:640])
            r = pre + "CGCTCTTCCGATCT" + bc + umi + "TTTCTTATATG" + gene
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    return str(fq), str(trns), str(wl)


def _gunzip(path):
    with gzip.open(path, "rb") as f:
        return f.read()


def _raw(path):
    with open(path, "rb") as f:
        return f.read()


def test_merge_equals_unsharded(sample, tmp_path):
    fq, trns, wl = sample
    kw = dict(trns_ref=trns, genome_ref=trns, barcodes=wl, batch_size=64)

    one = tmp_path / "one"
    run_pipeline("5p10XGEX", fq, str(one), "t", **kw)

    parts = split_fastq(fq, 2, str(tmp_path))
    shard_dirs = []
    for k, p in enumerate(parts):
        d = tmp_path / f"shard{k}"
        run_pipeline("5p10XGEX", p, str(d), "t", **kw)
        shard_dirs.append(str(d))

    merged = tmp_path / "merged"
    merge_shards("5p10XGEX", shard_dirs, str(merged), "t", **{
        k: v for k, v in kw.items() if k != "batch_size"})

    # decompressed record streams identical (merge byte-concats gzip
    # members, so compare content not container bytes)
    for art in ("t_deconcat.fastq.gz", "t_BCUMI.fasta.gz"):
        assert _gunzip(str(one / art)) == _gunzip(str(merged / art)), art

    # tables byte-identical
    assert _gunzip(str(one / "t_assignments.csv.gz")) == \
        _gunzip(str(merged / "t_assignments.csv.gz"))
    for art in ("t_bcumi_dedup.csv", "t_trns_ct.csv",
                "t_barcode_scores.csv"):
        assert _raw(str(one / art)) == _raw(str(merged / art)), art

    # tagged BAM record-identical (name/flag/pos/cigar/tags in order)
    from nanoranger_tpu.io.bam import read_bam

    def bam_rows(path):
        names, lens, recs = read_bam(path)
        return names, lens, [(r.name, r.flag, r.ref_id, r.pos, r.mapq,
                              tuple(r.cigar), r.seq, tuple(r.tags.items()))
                             for r in recs]

    n1, l1, r1 = bam_rows(str(one / "t_genome_tagged.bam"))
    n2, l2, r2 = bam_rows(str(merged / "t_genome_tagged.bam"))
    assert (n1, l1) == (n2, l2)
    assert r1 == r2
    assert os.path.isfile(merged / "t_genome_tagged.bam.bai")
    assert os.path.isfile(merged / "t_knee.pdf")
    assert os.path.isfile(merged / "t_barcode_scores.pdf")
