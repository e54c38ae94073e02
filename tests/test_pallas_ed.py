"""Pallas edit-distance kernel (interpret mode on CPU) vs the jnp
implementation that is itself validated against the edlib port."""

import numpy as np
import pytest

from nanoranger_tpu.io.encode import PAD
from nanoranger_tpu.ops.edit_distance import hw_locate
from nanoranger_tpu.ops.pallas_ed import hw_locate_pallas


@pytest.mark.parametrize("wildcard", [False, True])
@pytest.mark.parametrize("pick_last", [False, True])
def test_pallas_matches_jnp(rng, wildcard, pick_last):
    B, W, m = 24, 128, 51
    alph = np.array([0, 1, 2, 3, 4], dtype=np.int8)
    pattern = rng.choice(alph, size=m, p=[0.24, 0.24, 0.24, 0.24, 0.04])
    texts = rng.choice(alph, size=(B, W),
                       p=[0.24, 0.24, 0.24, 0.24, 0.04]).astype(np.int8)
    lengths = rng.integers(m, W + 1, size=B).astype(np.int32)
    for b in range(B):
        texts[b, lengths[b]:] = PAD
    # plant the pattern in some rows to exercise real hits
    for b in range(0, B, 3):
        p0 = int(rng.integers(0, max(1, lengths[b] - m)))
        texts[b, p0:p0 + m] = pattern
    k = 6
    d0, s0, e0 = map(np.asarray, hw_locate(pattern, texts, lengths, k,
                                           wildcard=wildcard,
                                           pick_last=pick_last))
    d1, s1, e1 = map(np.asarray, hw_locate_pallas(pattern, texts, lengths, k,
                                                  wildcard=wildcard,
                                                  pick_last=pick_last))
    np.testing.assert_array_equal(d1, d0)
    hit = d0 >= 0
    np.testing.assert_array_equal(e1[hit], e0[hit])
    np.testing.assert_array_equal(s1[hit], s0[hit])
