"""Data-parallel streamed pipeline: N-device artifacts must be
byte-identical to 1-device (VERDICT r1 #4; the reference analogue is the
deterministic sorted-cat shard merge, SURVEY.md §4). Runs on the 8
virtual CPU devices from conftest."""

import gzip
import os

import numpy as np
import pytest

from nanoranger_tpu.io.encode import decode
from nanoranger_tpu.pipeline import run_pipeline


@pytest.fixture(scope="module")
def synthetic_sample(module_rng, tmp_path_factory):
    d = tmp_path_factory.mktemp("dp")
    refs = [module_rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    trns = d / "panel.fa"
    with open(trns, "w") as f:
        for i, r in enumerate(refs):
            f.write(f">G{i}\n{decode(r)}\n")
    bcs = sorted({"".join(module_rng.choice(list("ACGT"), 16)) for _ in range(64)})
    wl = d / "wl.txt.gz"
    with gzip.open(wl, "wt") as f:
        f.write("\n".join(bcs) + "\n")
    fq = d / "reads.fastq.gz"
    with gzip.open(fq, "wt") as f:
        for i in range(333):        # odd count: exercises partial batches
            bc = bcs[i % len(bcs)]
            umi = "".join(module_rng.choice(list("ACGT"), 10))
            pre = "".join(module_rng.choice(list("ACGT"), 25))
            gene = decode(refs[i % 2][40:640])
            r = pre + "CGCTCTTCCGATCT" + bc + umi + "TTTCTTATATG" + gene
            f.write(f"@r{i}\n{r}\n+\n{'I' * len(r)}\n")
    return str(fq), str(trns), str(wl)


def _run(sample, outdir, **kw):
    fq, trns, wl = sample
    run_pipeline("5p10XGEX", fq, str(outdir), "t", trns_ref=trns,
                 genome_ref="/nonexistent", barcodes=wl, batch_size=64, **kw)


def _content(path):
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def test_data_parallel_byte_identical(synthetic_sample, tmp_path):
    one = tmp_path / "one"
    many = tmp_path / "many"
    _run(synthetic_sample, one)
    _run(synthetic_sample, many, data_shards=4, wl_shards=2)
    for art in ("t_deconcat.fastq.gz", "t_BCUMI.fasta.gz",
                "t_assignments.csv.gz", "t_bcumi_dedup.csv"):
        a = _content(str(one / art))
        b = _content(str(many / art))
        assert a == b, f"{art} differs between 1-device and 4x2-mesh runs"
    assert os.path.isfile(one / "t_runstats.json")


def test_split_fastq_cat_roundtrip(synthetic_sample, tmp_path):
    """Multi-host input sharding: cat of parts == input record stream."""
    from nanoranger_tpu.io.fastq import iter_fastq
    from nanoranger_tpu.tools.split_fastq import split_fastq
    fq = synthetic_sample[0]
    parts = split_fastq(fq, 3, str(tmp_path))
    assert len(parts) == 3
    merged = []
    for p in parts:
        merged.extend((r.name, r.seq, r.qual) for r in iter_fastq(p))
    orig = [(r.name, r.seq, r.qual) for r in iter_fastq(fq)]
    assert merged == orig
