"""End-to-end barcode matching: synthetic candidates with known ground truth
against a slice of the real 737K whitelist."""

import numpy as np
import pytest

from nanoranger_tpu import chemistry
from nanoranger_tpu.io import whitelist
from nanoranger_tpu.io.encode import encode_batch
from nanoranger_tpu.stages.barcode import (ACCEPT, BAD_UMI, LOW_AS, MULTIMAP,
                                           NO_CAND, BarcodeMatcher)

REF_WL = "/root/reference/data/737K-august-2016.txt.gz"
ADAPTER = "CGCTCTTCCGATCT"


@pytest.fixture(scope="module")
def matcher():
    bcs = whitelist.load_txt(REF_WL)[:20000]
    spec = chemistry.get("5p10XGEX").barcode
    return BarcodeMatcher(bcs, spec)


def _cands(matcher, seqs, Lq=64):
    q, qlen = encode_batch(seqs, max_len=Lq)
    return matcher.match(q, qlen)


def test_exact_matches(matcher, rng):
    idx = rng.integers(0, len(matcher.barcodes), size=32)
    umis = ["".join(rng.choice(list("ACGT"), 10)) for _ in idx]
    seqs = [ADAPTER + matcher.barcodes[i] + u + "TTTCTTATAT"
            for i, u in zip(idx, umis)]
    r = _cands(matcher, seqs)
    assert (r["status"] == ACCEPT).all()
    assert (r["bc_idx"] == idx).all()
    assert (r["score"] == 16).all()
    from nanoranger_tpu.io.encode import decode
    for b, u in enumerate(umis):
        assert decode(r["umi"][b]) == u


def test_one_mismatch_accepted_when_unique(matcher, rng):
    # mutate one base; accepted iff no other whitelist bc ties at 14
    n_acc = 0
    idx = rng.integers(0, len(matcher.barcodes), size=64)
    seqs = []
    for i in idx:
        bc = list(matcher.barcodes[i])
        p = rng.integers(0, 16)
        bc[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[bc[p]]
        seqs.append(ADAPTER + "".join(bc) + "GGGGGAAAAA" + "TTTCTTATAT")
    r = _cands(matcher, seqs)
    acc = r["status"] == ACCEPT
    # at AS==14 (exactly the injected single mismatch) assignment must be
    # the injected barcode; a different assignment is only legitimate at a
    # strictly higher score (e.g. another whitelist barcode completed by
    # the first UMI base with one deletion → AS 15, which STAR would also
    # prefer).
    at14 = acc & (r["score"] == 14)
    assert (r["bc_idx"][at14] == idx[at14]).all()
    assert (r["score"][acc] >= 14).all()
    # with a 20k whitelist the majority of 1-mismatch reads should be
    # unique (the sorted prefix-clustered slice is adversarial; the rest
    # legitimately multimap). Deterministic under the per-test node-id
    # RNG: 31/64 for this draw with the EXACT engine (round 5) — the
    # round-4 screened engine accepted 33, missing two genuine
    # ties/rc-loci the exhaustive pass now finds (validated against
    # verify_all_xla + the brute-force oracle).
    assert acc.sum() == 31
    assert set(r["status"][~acc]) <= {MULTIMAP, LOW_AS}


def test_deletion_in_barcode(matcher, rng):
    idx = rng.integers(0, len(matcher.barcodes), size=32)
    seqs = []
    for i in idx:
        bc = matcher.barcodes[i]
        seqs.append(ADAPTER + bc[:5] + bc[6:] + "GGGGGAAAAA" + "TTTCTTATAT")
    r = _cands(matcher, seqs)
    acc = r["status"] == ACCEPT
    # like the mismatch test: at the injected-deletion score (14) the
    # assignment must be the true barcode; higher scores mean another
    # whitelist barcode legitimately fits better
    at14 = acc & (r["score"] == 14)
    assert (r["bc_idx"][at14] == idx[at14]).all()
    assert (r["score"][acc] >= 14).all()
    assert acc.sum() > 15


def test_garbage_no_candidates(matcher):
    r = _cands(matcher, ["ACGT" * 12, "TTTTGGGGCCCCAAAATTTTGGGGCCCCAAAA"])
    assert (r["status"] != ACCEPT).all()


def test_truncated_umi_bad(matcher, rng):
    i = int(rng.integers(0, len(matcher.barcodes)))
    # read ends 4 bases into the 10nt UMI
    seqs = [ADAPTER + matcher.barcodes[i] + "GGGG"]
    r = _cands(matcher, seqs)
    assert r["status"][0] == BAD_UMI


def test_multimap_construction(matcher):
    # find two whitelist barcodes at hamming distance 2; the midpoint read
    # (1 mismatch to each) must be dropped as a tie
    bcs = matcher.barcodes
    arr = np.frombuffer("".join(bcs[:4000]).encode(), dtype="S1").reshape(len(bcs[:4000]), 16)
    found = None
    for a in range(300):
        d = (arr != arr[a]).sum(axis=1)
        cand = np.where(d == 2)[0]
        if len(cand):
            found = (a, int(cand[0]))
            break
    assert found, "no hamming-2 pair in slice"
    a, b = found
    pos = np.where(arr[a] != arr[b])[0]
    mid = list(bcs[a])
    mid[pos[0]] = bcs[b][pos[0]]  # 1 mismatch to each
    r = _cands(matcher, [ADAPTER + "".join(mid) + "GGGGGAAAAA" + "TTTCTTATAT"])
    assert r["status"][0] == MULTIMAP


def test_exact_window_star_semantics(matcher):
    """Whole-candidate exact pass (round-4 match_parity finding): STAR
    aligns the full candidate against the full padded row, so a perfect
    barcode ANYWHERE the N pads can absorb is a score-16 locus — a
    second one (either strand) is a multimap drop, and one outside the
    screen's jitter window must still be found."""
    from nanoranger_tpu.io.encode import revcomp_str
    bcs = matcher.barcodes
    b0, b1 = bcs[100], bcs[20000 - 1]

    # 1) clean single barcode → ACCEPT (baseline)
    clean = ADAPTER + b0 + "GGGGGAAAAA" + "TTTCTTATAT"
    # 2) a second whitelist barcode right after the first (window start
    #    30 = pad_left, still absorbable by the N pads) → fwd tie
    two = ADAPTER + b0 + b1 + "AAAA"
    # 3) revcomp of another whitelist barcode in the same feasible
    #    position → rc tie with the perfect forward hit
    rc2 = ADAPTER + b0 + revcomp_str(b1) + "AAAA"
    # 4) barcode shifted 10 nt past the nominal offset — beyond the
    #    screen's jitter (8) but within pad_left: exact pass must accept
    far = ADAPTER + "ACGTACGTAC" + b0 + "GGGGGAAAAA"
    r = _cands(matcher, [clean, two, rc2, far])
    assert r["status"][0] == ACCEPT and r["bc_idx"][0] == 100
    assert r["status"][1] == MULTIMAP
    assert r["status"][2] == MULTIMAP
    assert r["status"][3] == ACCEPT and r["bc_idx"][3] == 100
    assert r["score"][3] == 16
