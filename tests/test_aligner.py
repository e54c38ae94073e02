"""Panel aligner: synthetic reads with known truth (substrings, revcomp,
chimeras/concatemers, mutations) against small reference panels."""

import numpy as np
import pytest

from nanoranger_tpu.align.aligner import PanelAligner
from nanoranger_tpu.align.index import PanelIndex
from nanoranger_tpu.io.encode import PAD, revcomp


def _batch(seqs, L=None):
    L = L or max(len(s) for s in seqs)
    L = ((L + 127) // 128) * 128
    codes = np.full((len(seqs), L), PAD, np.int8)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = s
        lens[i] = len(s)
    return codes, lens


@pytest.fixture(scope="module")
def panel(module_rng):
    seqs = [module_rng.integers(0, 4, size=n).astype(np.int8)
            for n in (800, 1200, 600)]
    return PanelIndex.build(["refA", "refB", "refC"], seqs), seqs


def test_exact_substring(panel):
    index, seqs = panel
    read = seqs[1][300:900]
    codes, lens = _batch([read])
    rec = PanelAligner(index).align(codes, lens)
    assert len(rec) == 1
    assert rec.ref_id[0] == 1
    assert rec.flag[0] == 0
    assert rec.qstart[0] <= 20 and rec.qend[0] >= len(read) - 20
    assert abs(rec.tstart[0] - 300) <= 20 and abs(rec.tend[0] - 900) <= 20


def test_revcomp_read(panel):
    index, seqs = panel
    read = revcomp(seqs[0][100:700])
    codes, lens = _batch([read])
    rec = PanelAligner(index).align(codes, lens)
    assert len(rec) == 1
    assert rec.ref_id[0] == 0
    assert rec.flag[0] == 16
    assert abs(rec.tstart[0] - 100) <= 20 and abs(rec.tend[0] - 700) <= 20


def test_read_with_flanks_and_errors(panel, rng):
    index, seqs = panel
    core = seqs[2][50:550].copy()
    # ~6% substitution errors (ONT-like)
    n_err = int(0.06 * len(core))
    pos = rng.choice(len(core), n_err, replace=False)
    core[pos] = (core[pos] + 1 + rng.integers(0, 3, n_err)) % 4
    read = np.concatenate([rng.integers(0, 4, 120).astype(np.int8), core,
                           rng.integers(0, 4, 80).astype(np.int8)])
    codes, lens = _batch([read])
    rec = PanelAligner(index).align(codes, lens)
    assert len(rec) == 1
    assert rec.ref_id[0] == 2
    assert abs(rec.qstart[0] - 120) <= 30
    assert abs(rec.qend[0] - 620) <= 30


def test_chimera_two_refs(panel):
    # concatenated read from two references → primary + supplementary
    index, seqs = panel
    read = np.concatenate([seqs[0][0:500], seqs[1][600:1100]])
    codes, lens = _batch([read])
    rec = PanelAligner(index).align(codes, lens)
    assert len(rec) == 2
    flags = sorted(rec.flag.tolist())
    assert flags[0] == 0 and flags[1] in (2048, 2064)
    assert set(rec.ref_id.tolist()) == {0, 1}


def test_concatemer_same_ref(panel):
    # 3 tandem copies of the same segment (MAS-ISO-seq style)
    index, seqs = panel
    seg = seqs[1][100:600]
    read = np.concatenate([seg, seg, seg])
    codes, lens = _batch([read])
    rec = PanelAligner(index).align(codes, lens)
    assert len(rec) == 3
    assert (rec.ref_id == 1).all()
    spans = sorted((int(a), int(b)) for a, b in zip(rec.qstart, rec.qend))
    # three non-overlapping ~500nt query spans
    assert spans[0][0] < 40 and spans[2][1] > 1450
    assert spans[0][1] <= spans[1][0] + 40 and spans[1][1] <= spans[2][0] + 40


def test_no_hit_random_read(panel, rng):
    index, _ = panel
    read = rng.integers(0, 4, size=400).astype(np.int8)
    codes, lens = _batch([read])
    rec = PanelAligner(index).align(codes, lens)
    assert len(rec) == 0


def test_batch_of_mixed_reads(panel, rng):
    index, seqs = panel
    reads = [seqs[0][i * 30:i * 30 + 400] for i in range(4)] + \
            [rng.integers(0, 4, size=400).astype(np.int8)]
    codes, lens = _batch(reads)
    rec = PanelAligner(index).align(codes, lens)
    assert set(rec.read_idx.tolist()) == {0, 1, 2, 3}
    assert (rec.ref_id == 0).all()
