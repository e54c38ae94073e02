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


def test_cuckoo_tables_match_sorted_lookup(rng):
    """Cuckoo probe == sorted-key binary search on every window key
    (round-5 TPU lookup redesign)."""
    import jax.numpy as jnp

    from nanoranger_tpu.stages.barcode import build_cuckoo, cuckoo_lookup

    keys = np.unique(rng.integers(0, 2**32, size=5000, dtype=np.uint32))
    vals = np.arange(len(keys), dtype=np.int32)
    tk, tv, lg = build_cuckoo(keys, vals)
    # every inserted key found with its value
    found, got = cuckoo_lookup(jnp.asarray(keys), jnp.asarray(tk),
                               jnp.asarray(tv), lg)
    assert np.asarray(found).all()
    np.testing.assert_array_equal(np.asarray(got), vals)
    # absent keys (not in the set) report not-found
    probe = rng.integers(0, 2**32, size=20000, dtype=np.uint32)
    absent = probe[~np.isin(probe, keys)]
    found, got = cuckoo_lookup(jnp.asarray(absent), jnp.asarray(tk),
                               jnp.asarray(tv), lg)
    assert not np.asarray(found).any()
    assert (np.asarray(got) == -1).all()


def test_tier_hits_cuckoo_equals_sorted(matcher, rng):
    """Full-class tier enumeration with cuckoo lookup == with
    searchsorted, on real whitelist keys."""
    import jax.numpy as jnp

    from nanoranger_tpu.stages.barcode import (N_TIERS, build_cuckoo,
                                               tier_hits)

    s = matcher.spec
    ks, idx, _ = matcher._ex_np
    tk, tv, lg = build_cuckoo(ks, idx)
    seqs = []
    for i in range(64):
        bc = matcher.barcodes[rng.integers(0, len(matcher.barcodes))]
        u = "".join(rng.choice(list("ACGT"), 10))
        b = list(bc)
        if i % 3 == 1:
            b[5] = "A" if b[5] != "A" else "C"          # 1-sub
        if i % 3 == 2:
            b.insert(7, "G")                            # 1-ins
        seqs.append(ADAPTER + "".join(b) + u + "TTTCT")
    q, qlen = encode_batch(seqs, max_len=64)
    q, qlen = jnp.asarray(q), jnp.asarray(qlen)
    a = tier_hits(q, qlen, jnp.asarray(ks), jnp.asarray(idx), s.bc_len,
                  s.pad_left, s.pad_right)
    b = tier_hits(q, qlen, jnp.asarray(ks), jnp.asarray(idx), s.bc_len,
                  s.pad_left, s.pad_right,
                  cuckoo=(jnp.asarray(tk), jnp.asarray(tv), lg))
    for k in range(N_TIERS):
        for x, y in zip(a[k], b[k]):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_staged_match_equals_host_path(rng):
    """The staged TPU orchestration (_match_tpu: exact pass → compacted
    full pass → compacted DP → combine) must be bit-identical to the
    host/full path.  Runs on CPU with a small whitelist (the staging
    logic is backend-independent)."""
    bcs = whitelist.load_txt(REF_WL)[:300]
    spec = chemistry.get("5p10XGEX").barcode
    m = BarcodeMatcher(bcs, spec)
    seqs = []
    for i in range(48):
        bc = bcs[rng.integers(0, len(bcs))]
        u = "".join(rng.choice(list("ACGT"), 10))
        if i % 5 == 4:
            seqs.append("".join(rng.choice(list("ACGT"), 40)))   # junk → DP
        elif i % 5 == 3:
            b = list(bc)
            b[3] = "A" if b[3] != "A" else "C"                   # 1-sub
            seqs.append(ADAPTER + "".join(b) + u + "TTTCT")
        else:
            seqs.append(ADAPTER + bc + u + "TTTCTTATAT")
    q, qlen = encode_batch(seqs, max_len=64)
    ref = m._match_host(q, qlen)
    got = m._match_tpu(q, np.asarray(qlen, np.int32))
    for k in ("bc_idx", "score", "status", "umi"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_fast_pass_verdicts_subset_of_full(rng):
    """dp=False (fused-step exact pass): every non-DP_PENDING verdict
    equals the full match; every candidate without a forward tier-16
    hit pends."""
    import jax.numpy as jnp

    from nanoranger_tpu.stages.barcode import DP_PENDING

    bcs = whitelist.load_txt(REF_WL)[:500]
    spec = chemistry.get("5p10XGEX").barcode
    m = BarcodeMatcher(bcs, spec)
    t = m.device_tables()
    seqs = []
    for i in range(32):
        bc = bcs[rng.integers(0, len(bcs))]
        u = "".join(rng.choice(list("ACGT"), 10))
        if i % 4 == 3:
            b = list(bc)
            b[8] = "A" if b[8] != "A" else "C"
            seqs.append(ADAPTER + "".join(b) + u + "TTTCT")
        else:
            seqs.append(ADAPTER + bc + u + "TTTCTTATAT")
    q, qlen = encode_batch(seqs, max_len=64)
    q, qlen = jnp.asarray(q), jnp.asarray(qlen)
    bc_f, sc_f, st_f, umi_f, _ = m.match_device_with(q, qlen, t, dp=False)
    full = m._match_host(np.asarray(q), np.asarray(qlen))
    st_f = np.asarray(st_f)
    done = st_f != DP_PENDING
    assert done.any() and (~done).any()
    np.testing.assert_array_equal(np.asarray(bc_f)[done],
                                  full["bc_idx"][done])
    np.testing.assert_array_equal(st_f[done], full["status"][done])
    np.testing.assert_array_equal(np.asarray(sc_f)[done],
                                  full["score"][done])
    np.testing.assert_array_equal(np.asarray(umi_f)[done],
                                  full["umi"][done])


def test_boundary_truncated_tie_multimaps(rng):
    """Round-5 exactness fix: STAR's DP enters/exits the core for FREE
    at the query boundaries, so a 1-truncated core anchored at the query
    edge (+1 insertion) scores m-2 — outside the interior edit classes.
    Found on nuc_synthetic parity (2/900): engine accepted while the
    exhaustive arbiter saw a score-14 tie.  Such candidates must route
    to the DP and multimap-drop."""
    spec = chemistry.get("3p10XTCR_nuc").barcode
    cand = "ATCGTACAGTGATCGAACAGGGTAGCTTGCTG"
    tie_a = "GATCGTACAGGATCGA"      # core[1:] + 1 ins anchored at start
    tie_b = "TACAGTGGTCGAACAG"      # interior 1-del structure
    fillers = sorted({"".join(rng.choice(list("ACGT"), 16))
                      for _ in range(60)} - {tie_a, tie_b})
    wl_arr = np.asarray(sorted([tie_a, tie_b] + fillers))
    m = BarcodeMatcher(wl_arr, spec)
    q, qlen = encode_batch([cand], max_len=64)
    r_host = m._match_host(q, np.asarray(qlen, np.int32))
    assert r_host["status"][0] == MULTIMAP, r_host
    assert r_host["score"][0] == 14
    r_staged = m._match_tpu(q, np.asarray(qlen, np.int32))
    for k in ("bc_idx", "score", "status"):
        assert r_staged[k][0] == r_host[k][0], (k, r_staged, r_host)
    # without the competing boundary row the interior structure is
    # unique at 14 -> engine accepts (no over-flagging of the verdict)
    wl2 = np.asarray(sorted([tie_b] + fillers))
    m2 = BarcodeMatcher(wl2, spec)
    r2 = m2._match_host(q, np.asarray(qlen, np.int32))
    assert r2["status"][0] in (ACCEPT, BAD_UMI)
    assert r2["score"][0] == 14
