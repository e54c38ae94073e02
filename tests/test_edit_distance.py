"""Parity of the batched HW search vs the O(mn) python port of edlib.

The python port (edlib_hw_reference) is itself validated here on hand-built
cases with known answers (exact infix, single mismatch/indel, wildcards).
"""

import numpy as np
import pytest

from nanoranger_tpu.io.encode import PAD, encode, encode_batch
from nanoranger_tpu.ops.edit_distance import edlib_hw_reference, hw_locate


def _locate(pattern, text_str, k, wildcard=False, pick_last=False, W=None):
    texts, lengths = encode_batch([text_str], max_len=W or len(text_str))
    d, s, e = hw_locate(encode(pattern), texts, lengths, k,
                        wildcard=wildcard, pick_last=pick_last)
    return int(d[0]), int(s[0]), int(e[0])


def test_exact_infix():
    d, s, e = _locate("ACGT", "TTTACGTTT", 0)
    assert (d, s, e) == (0, 3, 6)  # inclusive end


def test_single_mismatch():
    d, s, e = _locate("ACGT", "TTTACCTTT", 1)
    assert d == 1
    assert s == 3


def test_cutoff():
    d, s, e = _locate("ACGTACGT", "GGGGGGGG", 2)
    assert d == -1 and s == -1 and e == -1


def test_wildcard_pattern_n():
    # N in pattern matches anything when wildcard on, else only literal N
    d, _, _ = _locate("ACNNT", "GGACGTTGG", 0, wildcard=True)
    assert d == 0
    d2, _, _ = _locate("ACNNT", "GGACGTTGG", 0, wildcard=False)
    assert d2 == -1


def test_wildcard_text_n():
    d, _, _ = _locate("ACGT", "GGACNTGG", 0, wildcard=True)
    assert d == 0


def test_pick_first_vs_last():
    # two optimal ends: pattern occurs twice
    pat, txt = "ACGT", "ACGTTTACGT"
    d, s, e = _locate(pat, txt, 0, pick_last=False)
    assert (s, e) == (0, 3)
    d, s, e = _locate(pat, txt, 0, pick_last=True)
    assert (s, e) == (6, 9)


def test_padding_ignored():
    # same text with extra PAD columns must give identical results
    a = _locate("ACGT", "TTACGT", 1)
    b = _locate("ACGT", "TTACGT", 1, W=64)
    assert a == b


def test_smallest_start_convention():
    # deletion at match start creates tie between len-3 and len-4 spans:
    # pattern AACG vs text ...ACG...: start should be smallest optimal
    ref = edlib_hw_reference(encode("AACG"), encode("TTTACGTTT"), 1)
    got = _locate("AACG", "TTTACGTTT", 1)
    assert got[0] == ref["editDistance"]
    assert (got[1], got[2]) == ref["locations"][0]


@pytest.mark.parametrize("wildcard", [False, True])
def test_random_parity_vs_reference(rng, wildcard):
    # fixed shapes (one XLA compile per (wildcard, pick_last) combo);
    # length variation comes through PAD masking, as in production batches.
    m, W, trials = 14, 80, 10
    alph = np.array([0, 1, 2, 3, 4], dtype=np.int8)
    for _ in range(trials):
        pattern = rng.choice(alph, size=m, p=[0.24, 0.24, 0.24, 0.24, 0.04])
        n = int(rng.integers(m, W))
        text = rng.choice(alph, size=n, p=[0.24, 0.24, 0.24, 0.24, 0.04])
        k = int(rng.integers(0, 7))
        ref = edlib_hw_reference(pattern, text, k, wildcard)

        texts = np.full((1, W), PAD, dtype=np.int8)
        texts[0, :n] = text
        lengths = np.array([n], dtype=np.int32)
        for pick_last in (False, True):
            d, s, e = hw_locate(pattern, texts, lengths, k,
                                wildcard=wildcard, pick_last=pick_last)
            d, s, e = int(d[0]), int(s[0]), int(e[0])
            assert d == ref["editDistance"], (pattern, text, k)
            if d >= 0:
                want = ref["locations"][-1 if pick_last else 0]
                assert (s, e) == want, (pattern, text, k, ref["locations"])


def test_batch_many_rows(rng):
    # batched execution must equal per-row execution
    B, W, m = 33, 70, 12
    pattern = rng.integers(0, 4, size=m).astype(np.int8)
    texts = rng.integers(0, 4, size=(B, W)).astype(np.int8)
    lengths = rng.integers(m, W + 1, size=B).astype(np.int32)
    for b in range(B):
        texts[b, lengths[b]:] = PAD
    d, s, e = hw_locate(pattern, texts, lengths, 4, pick_last=True)
    for b in range(B):
        ref = edlib_hw_reference(pattern, texts[b, :lengths[b]], 4)
        assert int(d[b]) == ref["editDistance"]
        if ref["editDistance"] >= 0:
            assert (int(s[b]), int(e[b])) == ref["locations"][-1]
