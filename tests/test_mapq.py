"""minimap2-style MAPQ in alignment records (VERDICT r2 missing #4: the
tagged BAM previously hardcoded 60). Unique chains keep 60; chains
shadowed by a dropped near-equal secondary drop toward 0."""

import numpy as np

from nanoranger_tpu.align.aligner import PanelAligner
from nanoranger_tpu.align.index import PanelIndex
from nanoranger_tpu.io.encode import PAD, decode, encode


def _reads(seqs, L=2048):
    codes = np.full((len(seqs), L), PAD, np.int8)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        e = encode(s)[:L]
        codes[i, :len(e)] = e
        lens[i] = len(e)
    return codes, lens


def test_mapq_unique_vs_ambiguous(rng):
    base = rng.integers(0, 4, 1200).astype(np.int8)
    near = base.copy()                      # second ref ~99% identical
    pos = rng.choice(1200, 12, replace=False)
    near[pos] = (near[pos] + 1) % 4
    uniq = rng.integers(0, 4, 1200).astype(np.int8)
    index = PanelIndex.build(["dup1", "dup2", "uniq"],
                             [base, near, uniq])
    aligner = PanelAligner(index)
    r_amb = decode(base[100:900])           # maps to both dup refs
    r_unq = decode(uniq[100:900])
    codes, lens = _reads([r_amb, r_unq])
    rec = aligner.align(codes, lens)
    prim = {int(rec.read_idx[k]): int(rec.mapq[k])
            for k in range(len(rec)) if rec.flag[k] < 2048}
    assert prim[1] == 60, prim              # unique → max confidence
    assert prim[0] < 10, prim               # near-equal secondary → low
    assert (rec.mapq >= 0).all() and (rec.mapq <= 60).all()
