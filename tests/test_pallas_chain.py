"""Pallas chain-DP kernel (interpret mode) vs the XLA scan implementation."""

import numpy as np

from nanoranger_tpu.align.aligner import MAX_INTRON, _chain_dp_xla
from nanoranger_tpu.align.aligner import BANDWIDTH, MAX_GAP
from nanoranger_tpu.align.minimizers import K
from nanoranger_tpu.ops.pallas_chain import chain_dp_pallas


def _synthetic_anchors(rng, B=12, A=96, n_segs=3, intron=False):
    t = np.zeros((B, A), np.int32)
    q = np.zeros((B, A), np.int32)
    seg = np.full((B, A), 1 << 30, np.int32)
    valid = np.zeros((B, A), bool)
    for b in range(B):
        n = int(rng.integers(20, A))
        # anchors spread over a few segments, sorted by (seg, t, q)
        sg = np.sort(rng.integers(0, n_segs, n)).astype(np.int32)
        tt = np.zeros(n, np.int64)
        for s in np.unique(sg):
            m = sg == s
            base = np.sort(rng.integers(0, 3000, m.sum()))
            if intron and m.sum() > 4:
                # second half jumps by an intron-sized target gap
                half = m.sum() // 2
                base[half:] += int(rng.integers(MAX_GAP + 1000, 60_000))
            tt[m] = base
        qq = np.maximum(tt % 3000 + rng.integers(-40, 40, n), 0)
        order = np.lexsort((qq, tt, sg))
        t[b, :n] = tt[order]
        q[b, :n] = qq[order]
        seg[b, :n] = sg[order]
        valid[b, :n] = True
    return t, q, seg, valid


def test_chain_parity(rng):
    t, q, seg, valid = _synthetic_anchors(rng)
    f0, p0, r0 = map(np.asarray, _chain_dp_xla(t, q, seg, valid,
                                               MAX_GAP, BANDWIDTH, 0))
    f1, p1, r1 = map(np.asarray, chain_dp_pallas(t, q, seg, valid, K,
                                                 MAX_GAP, BANDWIDTH,
                                                 interpret=True))
    np.testing.assert_allclose(f1[valid], f0[valid], rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(p1[valid], p0[valid])
    np.testing.assert_array_equal(r1[valid], r0[valid])
    # roots must be the transitive closure of parents
    for b in range(t.shape[0]):
        for a in np.where(valid[b])[0]:
            x = a
            while p0[b, x] >= 0:
                x = p0[b, x]
            assert r0[b, a] == x


def test_chain_parity_splice(rng):
    t, q, seg, valid = _synthetic_anchors(rng, intron=True)
    f0, p0, r0 = map(np.asarray, _chain_dp_xla(
        t, q, seg, valid, MAX_GAP, BANDWIDTH, MAX_INTRON))
    f1, p1, r1 = map(np.asarray, chain_dp_pallas(
        t, q, seg, valid, K, MAX_GAP, BANDWIDTH, max_intron=MAX_INTRON,
        interpret=True))
    np.testing.assert_allclose(f1[valid], f0[valid], rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(p1[valid], p0[valid])
    np.testing.assert_array_equal(r1[valid], r0[valid])


def test_seg_gating_blocks_cross_ref_chains(rng):
    # identical diagonals in two segments: chains must not cross segments
    B, A = 2, 64
    n = 40
    t = np.zeros((B, A), np.int32)
    q = np.zeros((B, A), np.int32)
    seg = np.full((B, A), 1 << 30, np.int32)
    valid = np.zeros((B, A), bool)
    tt = np.arange(n) * 50
    t[0, :n] = tt
    q[0, :n] = tt
    seg[0, :n] = np.where(np.arange(n) < n // 2, 0, 2)
    valid[0, :n] = True
    f, p, r = map(np.asarray, _chain_dp_xla(t, q, seg, valid,
                                            MAX_GAP, BANDWIDTH, 0))
    roots = r[0, :n]
    assert len(np.unique(roots[: n // 2])) == 1
    assert len(np.unique(roots[n // 2:])) == 1
    assert roots[0] != roots[-1]
