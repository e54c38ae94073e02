"""Native VDJ clonotyper: CDR3 primitives, clustering, synthetic e2e."""

import numpy as np
import pandas as pd

from nanoranger_tpu.io.encode import encode
from nanoranger_tpu.vdj import cdr3 as cdr3mod
from nanoranger_tpu.vdj.clonotype import (ReadCall, assemble, lev_batch,
                                          write_exports)


# ---------------------------------------------------------------------------
# synthetic V genes: in-frame from ATG, single Cys in the final 15 codons

def _mk_v(seed, n_prefix_codons=95, tail="GCTATCCGTGAAAAA"):
    # random in-frame body from codons with no Cys/stop/Phe/Trp so the
    # single TGT near the end is the conserved Cys and no spurious motif
    safe = ["GCT", "GAA", "ACT", "CAA", "GGT", "CAT", "ATC", "CGT",
            "AAA", "CTG", "CCA", "AGC", "GTT", "TAC", "ATG", "GAC"]
    rng = np.random.default_rng(seed)
    body = "".join(rng.choice(safe, n_prefix_codons - 1))
    return "ATG" + body + "TGT" + tail        # tail: 5 codons after Cys


V1 = _mk_v(0)
V2 = _mk_v(1, 90, tail="CATATCAAAGGTCAT")    # C H I K G H
MOTIF_NT = "TTTGGAACCGGT"                     # F G T G
CREGION = "ACCAACGATCCTAGATCAGAAGCAGAGATCTCATGGAACAGCAGGATCTGAACAAA"


def test_translate_and_cys():
    assert cdr3mod.translate(encode("ATGTGTTTTGGA")) == "MCFG"
    assert cdr3mod.translate(encode("ATGNNNTGA")) == "MX*"
    v = encode(V1)
    pos = cdr3mod.v_cys_position(v)
    assert pos == len(V1) - 18
    assert cdr3mod.translate(v[pos:pos + 3]) == "C"


def test_find_motif_and_extract():
    insert = "GCTAGA"                          # A R
    read = V1[-120:] + insert + MOTIF_NT + CREGION
    cys_read = 120 - 18
    nt, aa = cdr3mod.extract_cdr3(encode(read), cys_read)
    assert nt == V1[-18:] + insert + "TTT"
    assert aa == "CAIREKARF"
    # frame rescue: single deletion inside the junction still yields a call
    broken = V1[-120:] + insert[1:] + MOTIF_NT + CREGION
    got = cdr3mod.extract_cdr3(encode(broken), cys_read)
    assert got is not None and got[1].endswith("_")
    # in-frame stop kills the call
    stopped = V1[-120:] + "TGATAA" + MOTIF_NT + CREGION
    assert cdr3mod.extract_cdr3(encode(stopped), cys_read,
                                frame_rescue=False) is None


def test_cigar_map():
    assert cdr3mod.cigar_map_t_to_q("10=", 4) == 4
    assert cdr3mod.cigar_map_t_to_q("3=2I5=", 6) == 8   # insertion shifts q
    assert cdr3mod.cigar_map_t_to_q("3=2D5=", 6) == 4   # deletion eats t
    assert cdr3mod.cigar_map_t_to_q("5=", 9) == -1


def test_lev_batch():
    rng = np.random.default_rng(1)

    def ref_lev(a, b):
        d = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            nd = [i]
            for j, cb in enumerate(b, 1):
                nd.append(min(d[j] + 1, nd[-1] + 1, d[j - 1] + (ca != cb)))
            d = nd
        return d[-1]

    alpha = list("ACGT")
    a_list, b_list = [], []
    for _ in range(40):
        a_list.append("".join(rng.choice(alpha, rng.integers(0, 30))))
        b_list.append("".join(rng.choice(alpha, rng.integers(1, 30))))
    got = lev_batch(a_list, b_list)
    want = [ref_lev(a, b) for a, b in zip(a_list, b_list)]
    assert got.tolist() == want


def test_assemble_two_tier():
    def calls_of(nt, n, chain="TRB", clean=True, tag=""):
        return [ReadCall(f"r{tag}{i}", "TRBV1-1|x", 100, chain, nt,
                         "CXXF" + ("" if clean else "_"), clean)
                for i in range(n)]

    parent_nt = "TGT" + "GCTAGA" * 5 + "TTT"
    sat_nt = parent_nt[:5] + "A" + parent_nt[6:]     # 1 substitution
    rescue_nt = parent_nt[:10] + parent_nt[11:]      # 1 deletion
    other_nt = "TGT" + "CATCGG" * 5 + "TTT"
    calls = (calls_of(parent_nt, 8) + calls_of(sat_nt, 3, tag="s")
             + calls_of(rescue_nt, 2, clean=False, tag="x")
             + calls_of(other_nt, 4, chain="TRA", tag="o"))
    clones, ids = assemble(calls)
    assert len(clones) == 2
    top = clones.iloc[0]
    assert top.nSeqImputedCDR3 == parent_nt
    assert top.cloneCount == 13          # 8 + 3 satellite + 2 rescued
    assert clones.iloc[1].cloneCount == 4
    assert len(ids) == 17                # every call got a cloneId
    assert (ids[ids.chains == "TRB"].cloneId == 0).all()
    # nested junction (exact suffix, diff V anchor) merges regardless of 2x
    ext_nt = "TGTTATCTC" + parent_nt
    clones2, _ = assemble(calls_of(parent_nt, 5)
                          + calls_of(ext_nt, 4, tag="n"))
    assert len(clones2) == 1
    assert clones2.iloc[0].cloneCount == 9
    # rescued calls never found clones
    clones3, ids3 = assemble(calls_of(parent_nt, 2)
                             + calls_of(other_nt, 3, clean=False, tag="z"))
    assert len(clones3) == 1 and len(ids3) == 2


def test_caller_e2e(tmp_path):
    from nanoranger_tpu.io.fastq import FastqWriter
    from nanoranger_tpu.vdj import call_clonotypes

    insert_a = "GCTAGA"
    insert_b = "CGGAAA"
    read_a = V1[-130:] + insert_a + MOTIF_NT + CREGION
    read_a_sub = read_a[:135] + ("A" if read_a[135] != "A" else "G") \
        + read_a[136:]                                   # 1 sub in junction
    read_a_del = V1[-130:] + insert_a[1:] + MOTIF_NT + CREGION  # frameshift
    read_b = V2[-130:] + insert_b + MOTIF_NT + CREGION

    fq = tmp_path / "subs.fastq.gz"
    with FastqWriter(str(fq)) as w:
        for i in range(6):
            w.write(f"a{i}_0_100_0_TRBV9-9|x", read_a, "I" * len(read_a))
        for i in range(2):
            w.write(f"as{i}_0_100_0_x", read_a_sub, "I" * len(read_a_sub))
        for i in range(2):
            w.write(f"ad{i}_0_100_0_x", read_a_del, "I" * len(read_a_del))
        for i in range(4):
            w.write(f"b{i}_0_100_0_x", read_b, "I" * len(read_b))

    import nanoranger_tpu.align.index as idx_mod
    v_fa = tmp_path / "V.fa"
    v_fa.write_text(f">TRBV9-9|x\n{V1}\n>TRAV3-3|y\n{V2}\n")
    clones, ids = call_clonotypes(str(fq), [str(v_fa)], str(tmp_path),
                                  "syn", log=lambda *_: None)
    assert len(clones) == 2
    top = clones.iloc[0]
    assert top.chains == "TRB"
    assert top.nSeqImputedCDR3 == V1[-18:] + insert_a + "TTT"
    assert top.aaSeqImputedCDR3 == "CAIREKARF"
    assert top.cloneCount == 10           # 6 + 2 substituted + 2 frameshift
    assert clones.iloc[1].chains == "TRA"
    assert clones.iloc[1].cloneCount == 4

    # exports round-trip through the reference-shaped clone_filt + join
    from nanoranger_tpu.stages import clones as clone_stage
    assert clone_stage.have_mixcr_outputs("syn", str(tmp_path))
    _, cloneID = clone_stage.clone_filt_5p10X("syn", str(tmp_path))
    assert set(cloneID.columns) == {"chains", "cloneId"}
    joined = clone_stage.clone_bcumi_join(
        cloneID, [f"a{i}_0_100_0_TRBV9-9|x" for i in range(6)],
        np.asarray(["ACGTACGTACGTACGT"] * 6), ["ACGTACGTAC"] * 6,
        str(tmp_path / "syn_clone_bcumi.csv.gz"))
    assert len(joined) == 6
    assert (joined.cloneId == 0).all()


def test_d_segment_call():
    """Junction containing a germline TRBD2 core is called; TRA (no D
    genes) and random junctions are not (VERDICT r2 missing #3)."""
    import os
    from nanoranger_tpu.vdj.clonotype import DPanel
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dp = DPanel(os.path.join(REPO, "data", "TR_D_human.fa"))
    junction = "TGTGCC" + "AGCGGGGGG" + "CTCACCTTT"  # TRBD2 9nt core
    nm, sc = dp.call(junction, "TRB")
    assert nm.startswith("TRBD2") and sc >= 7, (nm, sc)
    assert dp.call(junction, "TRA") == ("", 0)
    assert dp.call("TGTGCCTATATATATATCTCACCTTT", "TRB") == ("", 0)
    # one sequencing error inside the D core still calls
    nm2, sc2 = dp.call("TGTGCC" + "AGCGGAGGG" + "CTCACCTTT", "TRB")
    assert nm2.startswith("TRBD2"), (nm2, sc2)


def test_cdr3_imputation():
    """N bases in the V-templated prefix impute from the germline V tail
    (fullImputed analogue); disagreeing prefixes stay untouched."""
    from nanoranger_tpu.vdj.clonotype import impute_cdr3
    v_tail = "TGTGCCAGCAGC"
    assert impute_cdr3("TGTNCCAGCTTTGGG", v_tail) == "TGTGCCAGCTTTGGG"
    # beyond the V tail: untouched
    assert impute_cdr3("TGTGCCAGCAGCNNN", v_tail) == "TGTGCCAGCAGCNNN"[:12] + "NNN"
    # disagreeing context: no imputation
    assert impute_cdr3("AAANAACCCTTTGGG", v_tail) == "AAANAACCCTTTGGG"
    # no Ns: no-op
    assert impute_cdr3("TGTGCC", v_tail) == "TGTGCC"


def test_assemble_carries_d_and_imputed(rng):
    import os
    from nanoranger_tpu.vdj.clonotype import DPanel, ReadCall, assemble
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dp = DPanel(os.path.join(REPO, "data", "TR_D_human.fa"))
    nt = "TGTGCC" + "GGGACAGGGGGC" + "TACTTT"      # TRBD1 core
    aa = "CASGGGYF"[:len(nt)//3]
    calls = [ReadCall(f"r{i}", "TRBV9|X", 100, "TRB", nt, "CAGTGYF"[:6],
                      clean=True) for i in range(3)]
    clones, _ = assemble(calls, v_tails={"TRBV9|X": "TGTGCCAGC"},
                         d_panel=dp)
    assert clones.allDHitsWithScore.iloc[0].startswith("TRBD1")


def test_assemble_partial_junction_merge():
    """Partial junctions (read truncated before the J motif) overlap-merge
    onto assembled clones — the MiXCR v4 assemblePartial/extend analogue
    (reference scripts/mixcr4.sh:10-14). Unique prefix match joins and
    counts; ambiguous (distance tie across clones) drops; prefix from an
    unrelated junction drops."""
    def calls_of(nt, n, chain="TRB", tag=""):
        return [ReadCall(f"r{tag}{i}", "TRBV1-1|x", 100, chain, nt,
                         "CXXF", True) for i in range(n)]

    a_nt = "TGT" + "GCTAGA" * 5 + "TTT"
    b_nt = "TGT" + "CATCGG" * 5 + "TTT"
    calls = calls_of(a_nt, 6) + calls_of(b_nt, 3, tag="b")

    # unique partial: prefix of a_nt with one substitution
    p1 = a_nt[:18]
    p1 = p1[:7] + ("A" if p1[7] != "A" else "C") + p1[8:]
    # ambiguous partial: equal distance to both clones' shared prefix
    p2 = "TGT" + "AAAAAA" + "AAAAAA"       # far from both → drops via cap
    # unrelated long junk prefix
    partial_calls = [
        ReadCall("pp1", "TRBV1-1|x", 90, "TRB", p1, "", clean=False,
                 partial=True),
        ReadCall("pp2", "TRBV1-1|x", 90, "TRB", p2, "", clean=False,
                 partial=True),
    ]
    stats = {}
    clones, ids = assemble(calls + partial_calls, stats=stats)
    assert stats["n_partial_reads"] == 2
    assert stats["n_partial_assigned"] == 1
    top = clones.iloc[0]
    assert top.nSeqImputedCDR3 == a_nt
    assert top.cloneCount == 7             # 6 clean + 1 partial merged
    assert "pp1" in set(ids.descrsR1)
    assert "pp2" not in set(ids.descrsR1)

    # ambiguity: two clones sharing the probed prefix -> tie -> drop
    c_nt = a_nt[:24] + "TACGTT" + "TTT"    # same first 24nt as a_nt
    calls2 = calls_of(a_nt, 6) + calls_of(c_nt, 3, tag="c")
    tie = [ReadCall("pt", "TRBV1-1|x", 90, "TRB", a_nt[:18], "",
                    clean=False, partial=True)]
    stats2 = {}
    clones2, ids2 = assemble(calls2 + tie, stats=stats2)
    assert stats2["n_partial_assigned"] == 0
    assert "pt" not in set(ids2.descrsR1)
