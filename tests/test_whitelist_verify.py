"""ops/whitelist_verify vs the brute-force per-pair reference DP.

The one-vs-all flipped DP must equal scoring each padded row with
ops/sw.sw_end2end_reference (the STAR-equivalent scoring model) for every
(candidate, row) — including pad-capacity overflow, N chars, empty/short
queries, ties, and padded whitelist rows.
"""

import numpy as np
import pytest

from nanoranger_tpu.io.encode import N, PAD, encode_batch
from nanoranger_tpu.ops.whitelist_verify import (NEG, verify_all_xla,
                                                 verify_reference)

BASES = "ACGT"


def _rand_seq(rng, n):
    return "".join(rng.choice(list(BASES)) for _ in range(n))


def _run_case(rng, C, R, m, pad_left, pad_right, Lq, planted=True,
              with_n=False):
    cores = np.array([[rng.integers(0, 4) for _ in range(m)]
                      for _ in range(R)], np.int8)
    seqs = []
    for i in range(C):
        n = int(rng.integers(0, Lq + 1))
        s = [int(rng.integers(0, 4)) for _ in range(n)]
        if planted and n >= m and rng.random() < 0.5:
            # plant a (possibly mutated) core somewhere
            r = int(rng.integers(0, R))
            pos = int(rng.integers(0, n - m + 1))
            core = list(cores[r])
            if rng.random() < 0.5:
                core[int(rng.integers(0, m))] = int(rng.integers(0, 4))
            s[pos:pos + m] = core
        if with_n and n:
            s[int(rng.integers(0, n))] = N
        seqs.append(np.asarray(s, np.int8))
    q = np.full((C, Lq), PAD, np.int8)
    qlen = np.zeros(C, np.int32)
    for i, s in enumerate(seqs):
        q[i, :len(s)] = s
        qlen[i] = len(s)

    best, idx, ties = map(np.asarray, verify_all_xla(
        q, qlen, cores.T.copy(), R, pad_left, pad_right, r_chunk=8))
    for i in range(C):
        eb, ei, et = verify_reference(seqs[i], cores, pad_left, pad_right)
        assert best[i] == eb, (i, best[i], eb, seqs[i], qlen[i])
        assert ties[i] == et, (i, ties[i], et)
        assert idx[i] == ei, (i, idx[i], ei)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_small(seed):
    rng = np.random.default_rng(seed)
    _run_case(rng, C=6, R=13, m=8, pad_left=6, pad_right=9, Lq=24)


def test_pad_overflow_and_short():
    # pads too small to absorb the query -> forced insertions; plus empty
    # and single-char candidates
    rng = np.random.default_rng(7)
    _run_case(rng, C=8, R=9, m=6, pad_left=2, pad_right=3, Lq=18)


def test_n_chars_neutral():
    rng = np.random.default_rng(11)
    _run_case(rng, C=6, R=7, m=8, pad_left=5, pad_right=5, Lq=20,
              with_n=True)


def test_realistic_16mer_geometry():
    # 5p10X geometry: pads 30/40, 16-mer cores, ~short candidate
    rng = np.random.default_rng(3)
    _run_case(rng, C=4, R=11, m=16, pad_left=30, pad_right=40, Lq=50)


def test_padded_rows_masked():
    rng = np.random.default_rng(5)
    R, m = 5, 8
    cores = np.array([[rng.integers(0, 4) for _ in range(m)]
                      for _ in range(R)], np.int8)
    q = np.full((2, 20), PAD, np.int8)
    q[0, :m] = cores[2]
    qlen = np.array([m, 0], np.int32)
    coreT = np.pad(cores.T, ((0, 0), (0, 3)), constant_values=PAD)
    best, idx, ties = map(np.asarray, verify_all_xla(
        q, qlen, coreT, R, 4, 4, r_chunk=8))
    assert best[0] == m and idx[0] == 2 and ties[0] == 1
    # empty candidate: trivial score 0 vs every REAL row, never the pads
    assert best[1] == 0 and ties[1] == R


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_grouped_kernel_interpret(seed):
    """The grouped Pallas kernel (G candidates stacked along sublanes,
    post-loop Hq reduction) vs the validated XLA one-vs-all, in pallas
    interpret mode — covers group boundaries, short/empty queries, ties
    and padded rows without TPU hardware."""
    import jax.numpy as jnp

    from nanoranger_tpu.ops.whitelist_verify import _verify_pallas

    rng = np.random.default_rng(seed)
    C, R, m, PL, PR, Lq = 13, 100, 16, 14, 20, 48   # C not a multiple of G
    cores = np.array([[rng.integers(0, 4) for _ in range(m)]
                      for _ in range(R)], np.int8)
    q = np.full((C, Lq), PAD, np.int8)
    qlen = np.zeros(C, np.int32)
    for i in range(C):
        n = int(rng.integers(0, Lq + 1))
        s = [int(rng.integers(0, 4)) for _ in range(n)]
        if n >= m and rng.random() < 0.6:
            r = int(rng.integers(0, R))
            pos = int(rng.integers(0, n - m + 1))
            s[pos:pos + m] = list(cores[r])
        q[i, :n] = s
        qlen[i] = n
    r_valid = R - 3                                  # mask 3 padded rows
    ref = tuple(map(np.asarray, verify_all_xla(
        q, qlen, cores.T.copy(), r_valid, PL, PR, r_chunk=16)))
    got = tuple(map(np.asarray, _verify_pallas(
        jnp.asarray(q), jnp.asarray(qlen),
        jnp.full((C,), PL, jnp.int32), jnp.full((C,), PR, jnp.int32),
        jnp.asarray(cores.T.copy()), r_valid, RB=32, interpret=True)))
    for name, a, b in zip(("best", "idx", "ties"), got, ref):
        np.testing.assert_array_equal(a, b, err_msg=name)
