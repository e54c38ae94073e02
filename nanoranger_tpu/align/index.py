"""Reference minimizer index (host build, device-shippable arrays).

Covers both regimes the reference hits with minimap2:
  - tiny transcript panels (2-306 seqs, data/*.fa) for `-x map-ont`
    transcriptome alignment (scripts/align_trns.sh:9)
  - multi-Mb genomes for `-x splice` genome alignment
    (scripts/align_genome.sh:9)

Coordinates are (ref_id, strand, local position): each anchor carries a
segment id `seg = ref_id*2 + strand` and an int32 position local to its
reference. Chains may only join anchors of equal seg (enforced in the
chain DP), so reference/strand boundaries need no global-axis spacing
tricks and the addressable genome size is unbounded (any per-reference
length < 2^31).

Long references are sketched in fixed-size overlapping chunks so the
build never materializes a pow2-padded whole-sequence batch: each chunk
carries W-1 k-mers of context on both sides, which makes the chunked
minimizer selection bit-identical to whole-sequence sketching (the
closed-form window rule in minimizers.py only looks W-1 k-mers away).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..io import fasta
from .minimizers import K, W, sketch_batch

# refs whose length exceeds this are sketched in streaming chunks
# refs at or below this length sketch through the padded multi-row batch
# path; only truly chromosome-scale refs take the per-ref streaming
# chunker.  Was 1<<15, which sent transcriptome-scale refs (GENCODE
# transcripts, the scale-bench 40 kb synthetics) through _sketch_chunked
# ONE AT A TIME — 4-row padded calls with 3 empty rows, ~4,000 device
# dispatches for a 160 Mb transcriptome (measured 1551 s; ~60 s after
# this change).
SMALL_REF_LIMIT = 1 << 18
CHUNK_KMERS = 1 << 17        # k-mer positions accepted per chunk
_CTX = W - 1                 # k-mers of boundary context per side


@dataclasses.dataclass
class PanelIndex:
    names: list
    seq_codes: list           # list of np int8 arrays (for extension/CIGARs)
    ref_lens: np.ndarray      # (R,)
    ref_offset: np.ndarray    # (R,) concatenated-layout offsets (host only)
    # sorted-by-hash flat minimizer arrays:
    hashes: np.ndarray        # (A,) uint32 sorted
    tpos: np.ndarray          # (A,) int32 position within its ref
    ref_id: np.ndarray        # (A,) int32
    strand: np.ndarray        # (A,) int32

    @classmethod
    def build(cls, names: list, seqs: list) -> "PanelIndex":
        ref_lens = np.array([len(s) for s in seqs], dtype=np.int32)
        ref_offset = np.zeros(len(seqs), dtype=np.int64)
        if len(seqs) > 1:
            ref_offset[1:] = np.cumsum(ref_lens[:-1].astype(np.int64))
        R = len(seqs)
        if R == 0:
            z32 = np.zeros(0, np.int32)
            return cls([], [], ref_lens, ref_offset,
                       np.zeros(0, np.uint32), z32, z32.copy(), z32.copy())

        hs, ps, rs, ss = [], [], [], []
        small = [rid for rid in range(R) if ref_lens[rid] <= SMALL_REF_LIMIT]
        large = [rid for rid in range(R) if ref_lens[rid] > SMALL_REF_LIMIT]
        if small:
            h_s, p_s, s_s = _sketch_small_batch([seqs[r] for r in small],
                                                ref_lens[small])
            for j, rid in enumerate(small):
                hs.append(h_s[j])
                ps.append(p_s[j])
                rs.append(np.full(len(h_s[j]), rid, np.int32))
                ss.append(s_s[j])
        for rid in large:
            h_l, p_l, s_l = _sketch_chunked(np.asarray(seqs[rid], np.int8))
            hs.append(h_l)
            ps.append(p_l)
            rs.append(np.full(len(h_l), rid, np.int32))
            ss.append(s_l)

        h = np.concatenate(hs) if hs else np.zeros(0, np.uint32)
        p = np.concatenate(ps).astype(np.int32) if ps else np.zeros(0, np.int32)
        r = np.concatenate(rs) if rs else np.zeros(0, np.int32)
        s = np.concatenate(ss).astype(np.int32) if ss else np.zeros(0, np.int32)
        order = np.argsort(h, kind="stable")
        return cls(list(names), [np.asarray(x, np.int8) for x in seqs],
                   ref_lens, ref_offset,
                   h[order], p[order], r[order], s[order])

    @classmethod
    def from_fasta(cls, path: str) -> "PanelIndex":
        names, seqs = fasta.read_fasta_encoded(path)
        return cls.build(names, seqs)

    @property
    def n_refs(self) -> int:
        return len(self.names)

    def global_t(self) -> np.ndarray:
        """Concatenated-layout coordinate of each indexed minimizer
        (host-side convenience only; the device works in local coords)."""
        return self.ref_offset[self.ref_id] + self.tpos.astype(np.int64)


def _sketch_small_batch(seqs, lens, max_rows: int = 1024):
    """Padded sketch_batch over the small refs, in bounded row groups:
    pow2-bucketed (B, L) shapes keep XLA compiles shared across panels and
    runs, and the row cap keeps peak memory bounded for transcriptome-
    scale panels (GENCODE: ~250k transcripts — one monolithic padded
    batch would materialize tens of GB)."""
    from ..io.encode import PAD
    R = len(seqs)
    # group refs by pow2 length bucket so padding waste stays ~2x and each
    # (rows, L) shape compiles once; a cell budget caps rows x padded-L so
    # long-ref groups shrink instead of materializing GB-scale batches
    CELLS = 1 << 24
    order = sorted(range(R), key=lambda r: int(lens[r]))
    hs: list = [None] * R
    ps: list = [None] * R
    ss: list = [None] * R

    def pow2ceil(x, lo=128):
        v = lo
        while v < x:
            v *= 2
        return v

    i = 0
    while i < R:
        L = pow2ceil(int(lens[order[i]]))
        grp = [order[i]]
        j = i + 1
        while j < R and len(grp) < max_rows:
            L2 = pow2ceil(int(lens[order[j]]))     # >= L (sorted)
            if (len(grp) + 1) * L2 > CELLS:
                break
            L = L2
            grp.append(order[j])
            j += 1
        B = 1
        while B < len(grp):
            B *= 2
        codes = np.full((B, L), PAD, np.int8)
        ln = np.zeros(B, np.int32)
        for k, rid in enumerate(grp):
            s_ = seqs[rid]
            codes[k, :len(s_)] = np.asarray(s_, np.int8)
            ln[k] = lens[rid]
        h_b, p_b, s_b, cnt = sketch_batch(codes, ln, L)
        h_b, p_b, s_b = np.asarray(h_b), np.asarray(p_b), np.asarray(s_b)
        cnt = np.asarray(cnt)
        for k, rid in enumerate(grp):
            c = int(cnt[k])
            hs[rid] = h_b[k, :c]
            ps[rid] = p_b[k, :c]
            ss[rid] = s_b[k, :c]
        i = j
    return hs, ps, ss


def _sketch_chunked(code: np.ndarray, chunk: int = CHUNK_KMERS,
                    rows: int = 4):
    """Streaming sketch of one long reference, bit-identical to whole-seq.

    K-mer positions are processed in `chunk`-sized spans; each span's row
    additionally carries W-1 k-mers of left/right context so the minimizer
    window rule sees exactly the neighborhood it would in the full
    sequence. Only positions inside the span are accepted from each row
    (the context regions are re-decided by their own chunks). Fixed row
    shapes keep the number of XLA compiles at one per (rows, L_row)."""
    from ..io.encode import PAD
    n_k = len(code) - K + 1
    if n_k <= 0:
        z = np.zeros(0, np.int32)
        return np.zeros(0, np.uint32), z, z.copy()
    L_row = chunk + 2 * _CTX + K - 1
    L_row = -(-L_row // 128) * 128
    spans = []
    for c0 in range(0, n_k, chunk):
        a0 = max(0, c0 - _CTX)
        a1 = min(n_k - 1, c0 + chunk - 1 + _CTX)
        spans.append((c0, min(c0 + chunk, n_k), a0, a1))
    hs, ps, ss = [], [], []
    for i in range(0, len(spans), rows):
        grp = spans[i:i + rows]
        codes = np.full((rows, L_row), PAD, np.int8)
        lens = np.zeros(rows, np.int32)
        for r, (c0, c1, a0, a1) in enumerate(grp):
            seg = code[a0:a1 + K]
            codes[r, :len(seg)] = seg
            lens[r] = len(seg)
        h, p, s, cnt = sketch_batch(codes, lens, L_row)
        h, p, s, cnt = (np.asarray(h), np.asarray(p), np.asarray(s),
                        np.asarray(cnt))
        for r, (c0, c1, a0, a1) in enumerate(grp):
            c = int(cnt[r])
            gpos = p[r, :c].astype(np.int64) + a0
            m = (gpos >= c0) & (gpos < c1)
            hs.append(h[r, :c][m])
            ps.append(gpos[m].astype(np.int32))
            ss.append(s[r, :c][m])
    return np.concatenate(hs), np.concatenate(ps), np.concatenate(ss)
