"""Round-2 parity/robustness fixes:

- slideseq _eds_names rows = every PRE-filter adapter hit with its real
  edit distance (reference utils.py:451-461), written as .csv.gz
- missing whitelist → clear SystemExit, not a FileNotFoundError traceback
- clonotype exports written atomically (resume sentinel safety)
- barcode-match checkpoint resume is fingerprint-guarded and the resumed
  result dict carries bc_idx
"""

import gzip
import os
import types

import numpy as np
import pandas as pd
import pytest

from nanoranger_tpu import chemistry
from nanoranger_tpu.align.aligner import PanelAligner
from nanoranger_tpu.align.index import PanelIndex
from nanoranger_tpu.io.encode import PAD, decode, encode, revcomp_str

LINKER = "TCTTCAGCGTTCCCGAGA"


@pytest.fixture(scope="module")
def cpanel(module_rng):
    seqs = [module_rng.integers(0, 4, size=900).astype(np.int8)]
    return PanelIndex.build(["CGENE"], seqs), seqs


def _slideseq_read(rng, transcript, bc="ACGTACGTACGTAC", umi="AAACCCGGG",
                   polya_len=30, polya_char="A"):
    """cDNA-orientation read: transcript then 3' flank carrying the
    revcomp'd bead oligo bc[:8]+linker+bc[8:]+umi."""
    bead = bc[:8] + LINKER + bc[8:] + umi
    flank = polya_char * polya_len + revcomp_str(bead)
    tail = "".join(rng.choice(list("ACGT"), 20))
    vdj = "".join(rng.choice(list("ACGT"), 250))   # upstream V(D)J region
    return vdj + decode(transcript) + flank + tail


def _run_slideseq(reads, cpanel):
    from nanoranger_tpu.stages.decon import run_decon
    index, _ = cpanel
    spec = chemistry.get("3pXCR_slideseq")
    L = ((max(len(r) for r in reads) + 127) // 128) * 128
    codes = np.full((len(reads), L), PAD, np.int8)
    lens = np.zeros(len(reads), np.int32)
    quals = []
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode(r)
        lens[i] = len(r)
        quals.append(b"I" * len(r))
    rec = PanelAligner(index).align(codes, lens)
    names = [f"sr{i}" for i in range(len(reads))]
    return run_decon(spec, codes, lens, names, quals, rec, index.names,
                     sample="t")


def test_slideseq_eds_rows_prefilter(cpanel, rng):
    index, seqs = cpanel
    # read 0: short polyA → passes the post filter (BCUMI emitted)
    r_ok = _slideseq_read(rng, seqs[0][50:650], polya_len=30)
    # read 1: >70nt low-A prefix → adapter hit but post filter rejects
    r_rej = _slideseq_read(rng, seqs[0][50:650], bc="TTGGCCAATTGGCC",
                           polya_len=80, polya_char="G")
    out = _run_slideseq([r_ok, r_rej], cpanel)
    # both hits appear in eds rows, with their REAL distances (0 here)
    assert len(out.eds_rows) == 2
    for name, ed in out.eds_rows:
        assert name.startswith(">sr")
        assert ed == 0
    # but only the post-filter survivor emits a BCUMI candidate
    assert len(out.bcumi_seqs) == 1
    assert out.bcumi_names[0].startswith("sr0_")


def test_slideseq_write_eds_artifact(tmp_path):
    from nanoranger_tpu.pipeline import DeconRun
    ns = types.SimpleNamespace(
        spec=chemistry.get("3pXCR_slideseq"), resumed=False,
        eds_rows=[(">a_t_0_10_0_C", 1), (">b_t_0_10_0_C", 3)],
        polyA=[(">a_t_0_10_0_C", "AAAAA")])
    DeconRun.write_eds(ns, str(tmp_path), "s")
    df = pd.read_csv(tmp_path / "s_eds_names.csv.gz")
    assert list(df["0"]) == [">a_t_0_10_0_C", ">b_t_0_10_0_C"]
    assert list(df["1"]) == [1, 3]
    assert (tmp_path / "s_polyA.fasta.gz").is_file()
    # resume set covers the stats artifacts
    arts = DeconRun.eds_artifacts(ns, str(tmp_path), "s")
    assert str(tmp_path / "s_eds_names.csv.gz") in arts


def test_missing_whitelist_clear_error(tmp_path):
    from nanoranger_tpu.pipeline import _load_whitelist
    with pytest.raises(SystemExit, match="whitelist not found"):
        _load_whitelist(str(tmp_path / "nope.txt.gz"), "3p10XTCR_nuc")


def test_clonotype_exports_atomic(tmp_path):
    from nanoranger_tpu.vdj.clonotype import CLONE_COLUMNS, write_exports
    clones = pd.DataFrame([[0, 2.0, "TRB", "TGTGCTTT", "CASSF", "TGTGC",
                            "TRBV1*00(10)", "", "TRBJ*00(5)",
                            "TRBC2*00(5)"]],
                          columns=CLONE_COLUMNS)
    cid = pd.DataFrame({"descrsR1": ["r1", "r2"], "cloneId": [0, 0],
                        "chains": ["TRB", "TRB"]})
    write_exports(clones, cid, str(tmp_path), "s")
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]
    with gzip.open(tmp_path / "s_clones.txt.gz", "rt") as f:
        assert f.readline().startswith("cloneId\t")
    with gzip.open(tmp_path / "s_cloneID.txt.gz", "rt") as f:
        assert f.readline().startswith("descrsR1\t")


def test_match_resume_fingerprint(tmp_path, rng):
    from nanoranger_tpu.io.candidate_store import CandidateStore
    from nanoranger_tpu.pipeline import match_barcodes
    spec = chemistry.get("5p10XGEX")
    wl_a = np.asarray(sorted({"".join(rng.choice(list("ACGT"), 16))
                              for _ in range(30)}))
    wl_b = np.asarray(sorted({"".join(rng.choice(list("ACGT"), 16))
                              for _ in range(31)}))
    names, seqs = [], []
    for i in range(6):
        bc = wl_a[i % len(wl_a)]
        umi = "".join(rng.choice(list("ACGT"), 10))
        names.append(f"c{i}_0_10_0_G")
        seqs.append("CGCTCTTCCGATCT" + bc + umi + "TTTCTTATATG")
    d = str(tmp_path)
    cands = CandidateStore.from_lists(names, seqs)
    df1, res1 = match_barcodes(spec, wl_a, cands, d, "s")
    assert "bc_idx" in res1
    # same fingerprint → resumed, and the resumed dict carries bc_idx
    df2, res2 = match_barcodes(spec, wl_a, cands, d, "s")
    assert "bc_idx" in res2
    np.testing.assert_array_equal(res1["bc_idx"], res2["bc_idx"])
    pd.testing.assert_frame_equal(
        df1.reset_index(drop=True), df2.reset_index(drop=True),
        check_dtype=False)
    m1 = os.path.getmtime(tmp_path / "s_assignments.csv.gz")
    # different whitelist → fingerprint mismatch → recomputed checkpoint
    match_barcodes(spec, wl_b, cands, d, "s")
    assert os.path.getmtime(tmp_path / "s_assignments.csv.gz") > m1


def test_tag_map_keeps_full_transcript_name():
    """XT parsing must not truncate transcript names containing '_'
    (deliberate fix of the reference's name.split('_')[4] defect,
    utils.py:745 — bundled panels have names like
    RUNX1T1-204|ENST00000422361.6_2450)."""
    import pandas as pd

    from nanoranger_tpu.pipeline import _tag_map_from_df
    from nanoranger_tpu.stages.barcode import ACCEPT
    name = "abc_10_200_0_RUNX1T1-204|ENST00000422361.6_2450"
    df = pd.DataFrame({"name": [name, "zzz_1_2_0_G"],
                       "bc": ["A" * 16] * 2, "umi": ["C" * 10] * 2,
                       "status": [ACCEPT, 99]})
    tag = _tag_map_from_df(df)
    assert tag[name][2] == "RUNX1T1-204|ENST00000422361.6_2450"
    assert "zzz_1_2_0_G" not in tag            # non-accept rows excluded
