"""Pallas chain-DP kernel (interpret mode) vs the XLA scan implementation."""

import numpy as np

from nanoranger_tpu.align.aligner import _chain_dp_xla
from nanoranger_tpu.ops.pallas_chain import chain_dp_pallas
from nanoranger_tpu.align.minimizers import K
from nanoranger_tpu.align.aligner import BANDWIDTH, MAX_GAP


def test_chain_parity(rng):
    B, A = 12, 96
    # synthetic sorted anchors: a noisy diagonal per read + noise anchors
    t = np.zeros((B, A), np.int32)
    q = np.zeros((B, A), np.int32)
    valid = np.zeros((B, A), bool)
    for b in range(B):
        n = int(rng.integers(20, A))
        tt = np.sort(rng.integers(0, 3000, n))
        qq = tt + rng.integers(-40, 40, n)
        t[b, :n] = tt
        q[b, :n] = np.maximum(qq, 0)
        valid[b, :n] = True
        t[b, n:] = 2_000_000_000
    f0, p0, r0 = map(np.asarray, _chain_dp_xla(t, q, valid))
    f1, p1, r1 = map(np.asarray, chain_dp_pallas(t, q, valid, K, MAX_GAP,
                                                 BANDWIDTH, interpret=True))
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
