"""Pallas SW rescorer kernel (interpret mode) vs the XLA implementation."""

import numpy as np
import pytest

from nanoranger_tpu.io.encode import PAD, encode_batch
from nanoranger_tpu.ops.pallas_sw import sw_end2end_pallas
from nanoranger_tpu.ops.sw import sw_end2end


@pytest.mark.parametrize("trial", range(2))
def test_pallas_sw_matches_xla(rng, trial):
    P, Lq, Lr = 20, 64, 86
    q = rng.integers(0, 4, size=(P, Lq)).astype(np.int8)
    qlen = rng.integers(30, Lq + 1, size=P).astype(np.int32)
    for p in range(P):
        q[p, qlen[p]:] = PAD
    # realistic padded-whitelist refs: N pads + planted barcode
    refs = np.full((P, Lr), 4, np.int8)     # all N
    for p in range(P):
        bc = rng.integers(0, 4, 16).astype(np.int8)
        refs[p, 30:46] = bc
        # plant bc (with occasional error) inside the query
        at = int(rng.integers(0, 20))
        q[p, at:at + 16] = bc
        if p % 3 == 0:
            q[p, at + 5] = (q[p, at + 5] + 1) % 4
    rlen = np.full(P, Lr, np.int32)
    c = 46
    s0, qp0, v0 = map(np.asarray, sw_end2end(q, qlen, refs, rlen, c))
    s1, qp1, v1 = map(np.asarray, sw_end2end_pallas(q, qlen, refs, rlen, c,
                                                    interpret=True))
    np.testing.assert_array_equal(s1, s0)
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_array_equal(qp1[v0], qp0[v0])
