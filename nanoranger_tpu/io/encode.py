"""Base encoding: DNA <-> small-int codes, vectorized (numpy host-side).

The whole engine works on int8 base codes instead of Python strings
(the reference slices Python strings per read, e.g. utils.py:130,139).

Code table:  A=0  C=1  G=2  T=3  N=4  PAD=5
 - N participates in wildcard matching (edlib `additionalEqualities`
   semantics, reference utils.py:15).
 - PAD marks positions beyond a sequence's length in fixed-shape batches;
   kernels must mask it out.
"""

from __future__ import annotations

import numpy as np

A, C, G, T, N, PAD = 0, 1, 2, 3, 4, 5
NUM_REAL_BASES = 4

_ASCII_TO_CODE = np.full(256, N, dtype=np.int8)  # unknown letters behave as N
for _ch, _code in [("A", A), ("C", C), ("G", G), ("T", T), ("N", N),
                   ("a", A), ("c", C), ("g", G), ("t", T), ("n", N)]:
    _ASCII_TO_CODE[ord(_ch)] = _code
_ASCII_TO_CODE[0] = PAD

_CODE_TO_ASCII = np.frombuffer(b"ACGTN.", dtype=np.uint8).copy()

# complement: A<->T, C<->G, N->N, PAD->PAD
COMPLEMENT = np.array([T, G, C, A, N, PAD], dtype=np.int8)


def encode(seq: str | bytes) -> np.ndarray:
    """Encode one sequence string to int8 codes."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    return _ASCII_TO_CODE[np.frombuffer(seq, dtype=np.uint8)]


def decode(codes: np.ndarray, length: int | None = None) -> str:
    """Decode int8 codes back to a string (drops PAD tail if length=None)."""
    codes = np.asarray(codes)
    if length is not None:
        codes = codes[:length]
    else:
        valid = codes != PAD
        if not valid.all():
            # keep prefix up to first PAD
            stop = int(np.argmax(~valid)) if (~valid).any() else len(codes)
            codes = codes[:stop]
    return _CODE_TO_ASCII[codes.astype(np.uint8)].tobytes().decode("ascii")


def encode_batch(seqs: list[bytes | str], max_len: int | None = None,
                 dtype=np.int8) -> tuple[np.ndarray, np.ndarray]:
    """Encode a list of sequences into a (B, L) PAD-padded matrix + lengths.

    Replaces the reference's per-read Python string handling with a columnar
    batch (SURVEY.md §7 design stance).
    """
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    L = int(max_len if max_len is not None else (lengths.max() if len(seqs) else 0))
    if len(seqs) and L and lengths.min() == lengths.max() == L:
        # equal-length fast path (whitelists: 737K barcodes encode in one
        # frombuffer instead of 737K row loops — ~40x)
        blob = ("".join(seqs).encode("ascii") if isinstance(seqs[0], str)
                else b"".join(seqs))
        out = _ASCII_TO_CODE[np.frombuffer(blob, dtype=np.uint8)]
        return out.reshape(len(seqs), L).astype(dtype, copy=False), lengths
    out = np.full((len(seqs), L), PAD, dtype=dtype)
    for i, s in enumerate(seqs):
        if isinstance(s, str):
            s = s.encode("ascii")
        n = min(len(s), L)
        out[i, :n] = _ASCII_TO_CODE[np.frombuffer(s, dtype=np.uint8)[:n]]
    lengths = np.minimum(lengths, L)
    return out, lengths


def revcomp(codes: np.ndarray) -> np.ndarray:
    """Reverse-complement encoded sequence (reference `rev`, utils.py:18-19)."""
    return COMPLEMENT[codes][::-1].copy()


def revcomp_str(seq: str) -> str:
    """Reverse-complement of a string (drop-in for reference utils.rev)."""
    return decode(revcomp(encode(seq)))


def revcomp_batch_padded(codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Reverse-complement each row of a PAD-padded (B, L) matrix in place of
    its valid prefix; PAD tail stays at the tail."""
    B, L = codes.shape
    out = np.full_like(codes, PAD)
    comp = COMPLEMENT[codes]
    for i in range(B):
        n = int(lengths[i])
        out[i, :n] = comp[i, :n][::-1]
    return out


def pack_2bit_kmers(codes: np.ndarray, k: int) -> np.ndarray:
    """Pack every k-mer (k<=16) of a code row into an int32 2-bit key.

    Positions containing N/PAD yield key -1 (invalid). Vectorized over the
    last axis; works on (L,) or (B, L) input, returning (..., L-k+1).
    """
    codes = np.asarray(codes)
    valid = codes < NUM_REAL_BASES
    c = np.where(valid, codes, 0).astype(np.int64)
    L = codes.shape[-1]
    n_kmers = L - k + 1
    if n_kmers <= 0:
        shape = codes.shape[:-1] + (0,)
        return np.zeros(shape, dtype=np.int64)
    keys = np.zeros(codes.shape[:-1] + (n_kmers,), dtype=np.int64)
    ok = np.ones(codes.shape[:-1] + (n_kmers,), dtype=bool)
    for j in range(k):
        keys = (keys << 2) | c[..., j:j + n_kmers]
        ok &= valid[..., j:j + n_kmers]
    return np.where(ok, keys, -1)
