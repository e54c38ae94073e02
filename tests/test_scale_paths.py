"""Scale-regime code paths (VERDICT r2 missing #2): many-transcript index
builds, product-table overflow fallback, and 1M-style product whitelists.
The full-size proof runs on TPU via tools/scale_bench.py (docs/SCALE_RUN
.json); these tests pin the paths it depends on at CI-friendly sizes."""

import numpy as np
import pytest

from nanoranger_tpu import chemistry
from nanoranger_tpu.io.encode import decode, encode_batch
from nanoranger_tpu.stages.barcode import ACCEPT, BarcodeMatcher


def _mk_bcs(rng, n, k=16):
    seen = set()
    while len(seen) < n:
        seen.add("".join(rng.choice(list("ACGT"), k)))
    return np.asarray(sorted(seen))


def test_product_table_overflow_falls_back_to_bucket(rng, monkeypatch):
    """Whitelists whose distinct-half product exceeds PAIR_LIMIT
    (ops/product_screen.py:30 — e.g. a fully random 3M list) must fall
    back to the bucket screen and still match."""
    from nanoranger_tpu.ops import product_screen as ps
    monkeypatch.setattr(ps, "PAIR_LIMIT", 1000)
    spec = chemistry.get("5p10XGEX").barcode
    wl = _mk_bcs(rng, 64)
    m = BarcodeMatcher(wl, spec)
    assert m.product is None and m._tables is not None
    bc = wl[17]
    q, qlen = encode_batch(
        ["CGCTCTTCCGATCT" + bc + "ACGTACGTAC" + "TTTCT"], max_len=96)
    r = m.match(q, qlen)
    assert r["status"][0] == ACCEPT and r["bc_idx"][0] == 17


def test_product_whitelist_100k(rng):
    """Product-structured whitelist at 100k-ish scale (the 1M/3M shape):
    ProductTable builds, and planted barcodes with an edit still match."""
    h1 = sorted({"".join(rng.choice(list("ACGT"), 8)) for _ in range(340)})
    h2 = sorted({"".join(rng.choice(list("ACGT"), 8)) for _ in range(340)})
    wl = np.asarray([a + b for a in h1 for b in h2][:100_000])
    spec = chemistry.get("5p10XGEX").barcode
    m = BarcodeMatcher(wl, spec)
    assert m.product is not None
    picks = rng.integers(0, len(wl), 8)
    seqs = []
    for i, p in enumerate(picks):
        bc = list(wl[p])
        if i % 2:
            bc[rng.integers(0, 16)] = "ACGT"[rng.integers(0, 4)]  # 1 sub
        seqs.append("CGCTCTTCCGATCT" + "".join(bc) + "ACGTACGTAC" + "TTTCT")
    q, qlen = encode_batch(seqs, max_len=96)
    r = m.match(q, qlen)
    ok = 0
    for i, p in enumerate(picks):
        if r["status"][i] == ACCEPT and r["bc_idx"][i] == p:
            ok += 1
    assert ok >= 6, (ok, r["status"], r["bc_idx"], picks)


def test_many_transcript_index_build(rng):
    """Row-chunked small-ref sketching (align/index._sketch_small_batch):
    thousands of transcripts build without a monolithic padded batch and
    reads align to first/middle/last entries."""
    from nanoranger_tpu.align.aligner import PanelAligner
    from nanoranger_tpu.align.index import PanelIndex
    from nanoranger_tpu.io.encode import PAD, encode
    n = 1300
    seqs = [rng.integers(0, 4, int(rng.integers(250, 900))).astype(np.int8)
            for _ in range(n)]
    index = PanelIndex.build([f"t{i}" for i in range(n)], seqs)
    assert len(index.hashes) > 50_000
    aligner = PanelAligner(index)
    targets = [0, n // 2, n - 1]
    codes = np.full((4, 1024), PAD, np.int8)
    lens = np.zeros(4, np.int32)
    for row, t in enumerate(targets):
        s = decode(seqs[t][:240])
        e = encode(s)
        codes[row, :len(e)] = e
        lens[row] = len(e)
    rec = aligner.align(codes, lens)
    got = {int(rec.read_idx[k]): int(rec.ref_id[k])
           for k in range(len(rec)) if rec.flag[k] < 2048}
    for row, t in enumerate(targets):
        assert got.get(row) == t, (row, t, got)
