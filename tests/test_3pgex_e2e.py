"""Synthetic 3p10XGEX end-to-end: windowed TruSeq scan → rev bcumi slices →
raw-barcode counting → data-driven whitelist → match → count matrix."""

import gzip

import numpy as np
import pytest

from nanoranger_tpu import chemistry
from nanoranger_tpu.align.aligner import PanelAligner
from nanoranger_tpu.align.index import PanelIndex
from nanoranger_tpu.chemistry import TRUSEQ
from nanoranger_tpu.io import whitelist
from nanoranger_tpu.io.encode import PAD, decode, encode, encode_batch, revcomp_str
from nanoranger_tpu.stages import counting
from nanoranger_tpu.stages.barcode import ACCEPT, BarcodeMatcher
from nanoranger_tpu.stages.decon import run_decon


@pytest.fixture(scope="module")
def setup(module_rng):
    seqs = [module_rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    index = PanelIndex.build(["GENEA", "GENEB"], seqs)
    bcs = ["".join(module_rng.choice(list("ACGT"), 16)) for _ in range(4)]
    return index, seqs, bcs


def _mk3p(rng, transcript, bc, umi):
    # forward read: transcript + 4nt + rc(umi) + rc(bc) + TruSeq + junk
    tail = ("ACGC" + revcomp_str(umi) + revcomp_str(bc) + TRUSEQ
            + "".join(rng.choice(list("ACGT"), 25)))
    return decode(transcript) + tail


def test_3pgex_end_to_end(setup, rng, tmp_path):
    index, seqs, bcs = setup
    spec = chemistry.get("3p10XGEX")
    reads, truth = [], []
    for i in range(48):
        bc = bcs[i % 4]
        umi = "".join(rng.choice(list("ACGT"), 12))
        gene = i % 2
        reads.append(_mk3p(rng, seqs[gene][50:650], bc, umi))
        truth.append((bc, umi, ["GENEA", "GENEB"][gene]))
    L = ((max(map(len, reads)) + 127) // 128) * 128
    codes = np.full((len(reads), L), PAD, np.int8)
    lens = np.zeros(len(reads), np.int32)
    quals = []
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode(r)
        lens[i] = len(r)
        quals.append(b"I" * len(r))
    rec = PanelAligner(index).align(codes, lens)
    names = [f"r{i}" for i in range(len(reads))]
    out = run_decon(spec, codes, lens, names, quals, rec, index.names, "t")

    # raw-barcode counting (bcumi[3:19], utils.py:1376)
    assert sum(out.raw_bc_counts.values()) >= 40
    assert set(out.raw_bc_counts) <= set(bcs)

    # bcumi structure: 3 truseq-rc bases + bc + umi + 4
    assert len(out.bcumi_seqs) >= 40
    k = 0
    got_bc = out.bcumi_seqs[k][3:19]
    assert got_bc in bcs

    # data-driven whitelist via master-list intersection
    master = str(tmp_path / "master.txt")
    with open(master, "w") as f:
        f.writelines(b + "\n" for b in bcs + ["AAAACCCCGGGGTTTT"])
    counts = {b: 30 for b in bcs}
    wl = whitelist.data_driven(counts, master, min_count=20)
    assert set(wl) == set(bcs)

    # match + count matrix
    m = BarcodeMatcher(np.asarray(wl), spec.barcode)
    q, qlen = encode_batch(out.bcumi_seqs, max_len=64)
    r = m.match(q, qlen)
    acc = r["status"] == ACCEPT
    assert acc.sum() >= 40
    # genes parsed from decon names: trans = name.split("_")[4]
    genes = [out.bcumi_names[i].split("_")[4] for i in range(len(acc))]
    g, c, cnt = counting.count_matrix(
        np.asarray([wl[r["bc_idx"][i]] for i in np.where(acc)[0]],
                   dtype=object),
        r["umi"][acc],
        np.asarray([genes[i] for i in np.where(acc)[0]], dtype=object))
    assert set(g) == {"GENEA", "GENEB"}
    assert set(c) <= set(bcs)
    # every accepted read carries a distinct UMI → counts sum == accepts
    assert cnt[:, 2].sum() == acc.sum()
