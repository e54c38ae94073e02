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


@pytest.mark.parametrize("pads", [(30, 40, 16), (15, 24, 32), (16, 28, 16),
                                  (4, 17, 16)])
def test_banded_matches_full(rng, pads):
    """Banded kernel (N-pad closed forms) == full kernel on every
    chemistry's pad geometry, including linker-style non-N cores."""
    from nanoranger_tpu.ops.pallas_sw import sw_end2end_banded_pallas
    pad_left, pad_right, core = pads
    Lr = pad_left + core + pad_right
    c = pad_left + core
    P, Lq = 24, 64
    q = rng.integers(0, 4, size=(P, Lq)).astype(np.int8)
    qlen = rng.integers(25, Lq + 1, size=P).astype(np.int32)
    refs = np.full((P, Lr), 4, np.int8)
    for p in range(P):
        q[p, qlen[p]:] = PAD
        bc = rng.integers(0, 4, core).astype(np.int8)
        refs[p, pad_left:pad_left + core] = bc
        at = int(rng.integers(0, 8))
        ln = min(core, int(qlen[p]) - at)
        q[p, at:at + ln] = bc[:ln]
        if p % 3 == 0 and ln > 6:
            q[p, at + 4] = (q[p, at + 4] + 1) % 4
        if p % 5 == 0 and ln > 8:       # indel damage
            q[p, at + 6:at + ln - 1] = q[p, at + 7:at + ln]
    rlen = np.full(P, Lr, np.int32)
    s0, qp0, v0 = map(np.asarray, sw_end2end(q, qlen, refs, rlen, c))
    s1, qp1, v1 = map(np.asarray, sw_end2end_banded_pallas(
        q, qlen, refs, Lr, c, pad_left, interpret=True))
    np.testing.assert_array_equal(s1, s0)
    np.testing.assert_array_equal(v1, v0)
    np.testing.assert_array_equal(qp1[v0], qp0[v0])
