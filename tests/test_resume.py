"""Stage resume-on-existence (reference idiom, SURVEY.md §5) with atomic
artifacts: rerunning the pipeline skips completed stages and reproduces
identical outputs; --force recomputes."""

import os

import numpy as np
import pandas as pd
import pytest

from nanoranger_tpu.io.encode import decode
from nanoranger_tpu.io.fastq import FastqWriter
from nanoranger_tpu.pipeline import run_pipeline


@pytest.fixture(scope="module")
def workdir(tmp_path_factory, module_rng):
    d = tmp_path_factory.mktemp("resume")
    refs = [module_rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    with open(d / "panel.fa", "w") as f:
        for i, r in enumerate(refs):
            f.write(f">G{i}\n{decode(r)}\n")
    wl = sorted({"".join(module_rng.choice(list("ACGT"), 16)) for _ in range(40)})
    with open(d / "wl.txt", "w") as f:
        f.write("\n".join(wl) + "\n")
    with FastqWriter(str(d / "reads.fastq.gz")) as w:
        for i in range(40):
            bc = wl[i % len(wl)]
            umi = "".join(module_rng.choice(list("ACGT"), 10))
            pre = "".join(module_rng.choice(list("ACGT"), 25))
            seq = (pre + "CGCTCTTCCGATCT" + bc + umi + "TTTCTTATATG"
                   + decode(refs[i % 2][50:500]))
            w.write(f"r{i}", seq, "I" * len(seq))
    return d


def _run(d, out, **kw):
    run_pipeline("5p10XGEX", str(d / "reads.fastq.gz"), str(out), "syn",
                 trns_ref=str(d / "panel.fa"), genome_ref=str(d / "panel.fa"),
                 barcodes=str(d / "wl.txt"), batch_size=64, **kw)


def test_resume_skips_and_matches(workdir, tmp_path):
    out = tmp_path / "o"
    _run(workdir, out)
    dedup1 = pd.read_csv(out / "syn_bcumi_dedup.csv", index_col=0)
    asg = out / "syn_assignments.csv.gz"
    bam = out / "syn_genome_tagged.bam"
    assert asg.is_file() and bam.is_file()
    m_asg = os.path.getmtime(asg)
    m_bam = os.path.getmtime(bam)

    # a stray half-written tmp file must never be treated as an artifact
    (out / "syn_BCUMI.fasta.gz.tmp").write_bytes(b"garbage")

    _run(workdir, out)                       # resumes every stage
    assert os.path.getmtime(asg) == m_asg    # match stage not recomputed
    assert os.path.getmtime(bam) == m_bam    # genome stage skipped
    dedup2 = pd.read_csv(out / "syn_bcumi_dedup.csv", index_col=0)
    pd.testing.assert_frame_equal(dedup1, dedup2)

    _run(workdir, out, force=True)           # --force recomputes
    assert os.path.getmtime(asg) > m_asg
    dedup3 = pd.read_csv(out / "syn_bcumi_dedup.csv", index_col=0)
    pd.testing.assert_frame_equal(dedup1, dedup3)


def test_resume_decon_only(workdir, tmp_path):
    """Deleting a downstream checkpoint recomputes just that stage from the
    decon artifacts (the reference's delete-a-file-and-rerun workflow)."""
    out = tmp_path / "o2"
    _run(workdir, out)
    asg = out / "syn_assignments.csv.gz"
    before = pd.read_csv(asg, keep_default_na=False)
    os.remove(asg)
    _run(workdir, out)
    after = pd.read_csv(asg, keep_default_na=False)
    pd.testing.assert_frame_equal(before, after)
