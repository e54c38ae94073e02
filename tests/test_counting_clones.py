"""Counting stage (UMI dedup, count matrix) and MiXCR-boundary clone joins."""

import gzip
import os

import numpy as np
import pandas as pd

from nanoranger_tpu.io.encode import encode_batch
from nanoranger_tpu.stages import clones, counting


def _umis(strs):
    codes, _ = encode_batch(strs, max_len=len(strs[0]))
    return codes


def test_umi_dedup_table():
    bcs = np.asarray(["A", "A", "A", "B", "B", "C"], dtype=object)
    umis = _umis(["AAAA", "AAAA", "CCCC", "GGGG", "GGGG", "TTTT"])
    t = counting.umi_dedup_table(bcs, umis)
    assert t.loc["A", "umi_cnt"] == 2 and t.loc["A", "read_cnt"] == 3
    assert t.loc["B", "umi_cnt"] == 1 and t.loc["B", "dup_rate"] == 2.0
    assert list(t.index) == ["A", "B", "C"]  # sorted by umi_cnt desc


def test_count_matrix_unique_umis(tmp_path):
    bcs = np.asarray(["A", "A", "A", "B"], dtype=object)
    umis = _umis(["AAAA", "AAAA", "CCCC", "AAAA"])
    genes = np.asarray(["g1", "g1", "g1", "g2"], dtype=object)
    g, c, cnt = counting.count_matrix(bcs, umis, genes)
    assert list(g) == ["g1", "g2"]
    assert list(c) == ["A", "B"]
    # g1/A: 2 unique umis (dup collapsed); g2/B: 1
    d = {(int(a), int(b)): int(n) for a, b, n in cnt}
    assert d == {(0, 0): 2, (1, 1): 1}
    counting.write_mtx(str(tmp_path / "s"), g, c, cnt)
    with gzip.open(tmp_path / "s_gex.mtx.gz", "rt") as f:
        lines = f.read().splitlines()
    assert lines[1] == "2 2 2"
    assert "1 1 2" in lines


def test_barcode_scores_table():
    t = counting.barcode_scores_table(np.asarray([16, 16, 14, 16, 12]))
    assert t.iloc[0]["score"] == 16 and t.iloc[0]["count"] == 3


def _write_mixcr_outputs(outdir, sample):
    clones_df = pd.DataFrame({
        "chains": ["TRB", "TRB", "TRA"],
        "aaSeqImputedCDR3": ["CASS1", "CASS1", "CAVR2"],
        "cloneCount": [10, 3, 5],
        "cloneId": [0, 1, 2],
        "nSeqImputedCDR3": ["TGT1", "TGT1", "TGT2"],
        "allVHitsWithScore": ["V1"] * 3,
        "allDHitsWithScore": ["D1"] * 3,
        "allJHitsWithScore": ["J1"] * 3,
    })
    cloneid_df = pd.DataFrame({
        "descrsR1": ["r1", "r2", "r3", "r4"],
        "cloneIdWithMappingType": ["0", "1", "2", "0"],
        "cloneId": [0, 1, 2, 0],
        "topChains": ["TRB", "TRB", "TRA", "TRB"],
        "chains": ["TRB", "TRB", "TRA", "TRB"],
    })
    clones_df.to_csv(f"{outdir}/{sample}_clones.txt.gz", sep="\t", index=False)
    cloneid_df.to_csv(f"{outdir}/{sample}_cloneID.txt.gz", sep="\t", index=False)


def test_clone_filt_and_join(tmp_path):
    outdir = str(tmp_path)
    _write_mixcr_outputs(outdir, "s")
    cl, cid = clones.clone_filt_5p10X("s", outdir)
    # clones sharing CDR3 'CASS1' merge into dominant cloneId 0
    assert set(cid.cloneId) == {0, 2}
    assert len(cl) == 2  # dedup by CDR3
    # join read→(bc, umi) with read→cloneId
    merged = clones.clone_bcumi_join(
        cid, ["r1", "r2", "r9"], np.asarray(["BC1", "BC2", "BC3"]),
        ["U1", "U2", "U3"], f"{outdir}/s_clone_bcumi.csv.gz")
    assert len(merged) == 2               # r9 has no clone
    assert set(merged.cloneId) == {0}     # r2's clone 1 merged into 0
    assert os.path.isfile(f"{outdir}/s_clone_bcumi.csv.gz")
