"""Reference panel minimizer index (host build, device-shippable arrays).

The reference panels are tiny (2–306 sequences, data/*.fa), so the index is
built once on host via the same jitted sketcher the reads use, then kept as
sorted flat arrays for device searchsorted lookup — replacing minimap2's
hash-table index for `-x map-ont` alignment (scripts/align_trns.sh:9).

Global target coordinates: references are laid out on one virtual axis with
REF_SPACING dead space between them, and reverse-strand anchors live in a
second half-space offset by STRAND_OFFSET. Chain gap constraints
(max_gap << REF_SPACING) then automatically forbid chains that cross
reference or strand boundaries — no per-anchor ref-id bookkeeping on device.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..io import fasta
from .minimizers import sketch_seq

REF_SPACING = 1 << 16       # > max_gap: isolates refs on the global t axis
STRAND_OFFSET = 1 << 28     # isolates relative-strand-1 anchors


@dataclasses.dataclass
class PanelIndex:
    names: list
    seq_codes: list           # list of np int8 arrays (for later extension)
    ref_lens: np.ndarray      # (R,)
    ref_offset: np.ndarray    # (R,) global t offset of each ref
    # sorted-by-hash flat minimizer arrays:
    hashes: np.ndarray        # (A,) uint32 sorted
    tpos: np.ndarray          # (A,) int32 position within its ref
    ref_id: np.ndarray        # (A,) int32
    strand: np.ndarray        # (A,) int32

    @classmethod
    def build(cls, names: list, seqs: list) -> "PanelIndex":
        from ..io.encode import PAD
        from .minimizers import sketch_batch

        ref_lens = np.array([len(s) for s in seqs], dtype=np.int32)
        ref_offset = np.zeros(len(seqs), dtype=np.int64)
        if len(seqs) > 1:
            ref_offset[1:] = np.cumsum(ref_lens[:-1] + REF_SPACING)
        R = len(seqs)
        if R == 0:
            z32 = np.zeros(0, np.int32)
            return cls([], [], ref_lens, ref_offset,
                       np.zeros(0, np.uint32), z32, z32.copy(), z32.copy())
        # one padded sketch_batch over ALL refs: per-seq sketching compiled
        # a fresh XLA program per unique length (dozens of panel genes =
        # dozens of compiles); pow2-bucketed (B, L) shapes are shared
        # across panels and runs. Identical minimizers (length-masked).
        Lmax = int(ref_lens.max())
        L = 128
        while L < Lmax:
            L *= 2
        B = 1
        while B < R:
            B *= 2
        codes = np.full((B, L), PAD, np.int8)
        for rid, s_ in enumerate(seqs):
            codes[rid, :len(s_)] = np.asarray(s_, np.int8)
        lens = np.zeros(B, np.int32)
        lens[:R] = ref_lens
        h_b, p_b, s_b, cnt = sketch_batch(codes, lens, L)
        h_b, p_b, s_b = np.asarray(h_b), np.asarray(p_b), np.asarray(s_b)
        cnt = np.asarray(cnt)
        hs, ps, rs, ss = [], [], [], []
        for rid in range(R):
            c = int(cnt[rid])
            hs.append(h_b[rid, :c])
            ps.append(p_b[rid, :c])
            rs.append(np.full(c, rid, np.int32))
            ss.append(s_b[rid, :c])
        h = np.concatenate(hs)
        p = np.concatenate(ps).astype(np.int32)
        r = np.concatenate(rs)
        s = np.concatenate(ss).astype(np.int32)
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
        """Global target coordinate of each indexed minimizer."""
        return self.ref_offset[self.ref_id] + self.tpos.astype(np.int64)
