"""Exact end-to-end SW rescorer vs brute-force oracle, plus semantic cases
mirroring the STAR barcode-matching trick."""

import numpy as np
import pytest

from nanoranger_tpu.io.encode import PAD, encode, encode_batch
from nanoranger_tpu.ops.sw import sw_end2end, sw_end2end_reference

BC = "ACGTACGTACGTACGT"  # 16nt
REF = "N" * 30 + BC + "N" * 40  # 5p10X padding (utils.py:615)
C = 46  # umi_ref_offset for 5p10X


def _run(queries, ref_strs, c=C, Lq=64):
    q, qlen = encode_batch(queries, max_len=Lq)
    refs, rlen = encode_batch(ref_strs, max_len=max(len(r) for r in ref_strs))
    score, qpos, valid = sw_end2end(q, qlen, refs, rlen, c)
    return np.asarray(score), np.asarray(qpos), np.asarray(valid)


def test_perfect_match_score16():
    # adapter(14) + bc + umi(10): exact bc → AS 16, umi right after bc
    query = "CGCTCTTCCGATCT" + BC + "GGGGGAAAAA"
    s, qp, v = _run([query], [REF])
    assert s[0] == 16
    assert v[0]
    assert qp[0] == 30  # 14 adapter + 16 bc
    assert query[qp[0]:qp[0] + 10] == "GGGGGAAAAA"


def test_one_mismatch_score14():
    query = "CGCTCTTCCGATCT" + "ACGTACGTACGTACGA" + "GGGGGAAAAA"
    s, qp, v = _run([query], [REF])
    assert s[0] == 14
    assert v[0] and qp[0] == 30


def test_one_deletion_score14():
    # bc missing one base: 15 matches - 1 del = 14
    query = "CGCTCTTCCGATCT" + BC[:7] + BC[8:] + "GGGGGAAAAA"
    s, qp, v = _run([query], [REF])
    assert s[0] == 14


def test_one_insertion_score14():
    query = "CGCTCTTCCGATCT" + BC[:8] + "T" + BC[8:] + "GGGGGAAAAA"
    s, qp, v = _run([query], [REF])
    # 16 matches - 1 ins = 15? insertion inside bc: still 16 matches, -1
    assert s[0] == 15
    assert v[0] and qp[0] == 31


def test_wrong_barcode_low_score():
    query = "CGCTCTTCCGATCT" + "TGCATGCATGCATGCA" + "GGGGGAAAAA"
    s, _, _ = _run([query], [REF])
    assert s[0] < 14


def test_umi_truncated_read_invalid_column():
    # query ends exactly at bc end: ref column 46 is never aligned by any
    # optimal path → reference's pair_dic[46] raises → umi 'N' (bad_bc);
    # here valid=False.
    query = "CGCTCTTCCGATCT" + BC
    s, qp, v = _run([query], [REF])
    assert s[0] == 16
    assert not v[0]
    assert qp[0] == -1


@pytest.mark.parametrize("trial", range(3))
def test_random_parity_vs_oracle(rng, trial):
    P, Lq, Lr = 16, 48, 60
    q = rng.integers(0, 4, size=(P, Lq)).astype(np.int8)
    qlen = rng.integers(20, Lq + 1, size=P).astype(np.int32)
    refs = rng.integers(0, 5, size=(P, Lr)).astype(np.int8)  # includes N
    for p in range(P):
        q[p, qlen[p]:] = PAD
    rlen = np.full(P, Lr, np.int32)
    c = 30
    score, qpos, valid = sw_end2end(q, qlen, refs, rlen, c)
    for p in range(P):
        s_ref, qp_ref, v_ref = sw_end2end_reference(q[p, :qlen[p]], refs[p], c)
        assert int(score[p]) == s_ref, p
        assert bool(valid[p]) == v_ref, p
        if v_ref:
            assert int(qpos[p]) == qp_ref, p


def test_slideseq_linker_ref():
    # slideseq ref: N15 + bc8 + linker + bc6 + N24, AS max = 32, umi at 47
    from nanoranger_tpu.chemistry import SLIDESEQ_LINKER
    bc = "ACGTACGTACGTAC"  # 14
    ref = "N" * 15 + bc[:8] + SLIDESEQ_LINKER + bc[8:] + "N" * 24
    query = "TTTTTTTT" + bc[:8] + SLIDESEQ_LINKER + bc[8:] + "CCCCCCCCC" + "AAAA"
    s, qp, v = _run([query], [ref], c=47)
    assert s[0] == 32
    assert v[0]
    assert qp[0] == 8 + 8 + 18 + 6  # umi starts after bc6
    assert query[qp[0]:qp[0] + 9] == "CCCCCCCCC"
