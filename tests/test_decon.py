"""Decon stage on synthetic 5' 10x reads with known structure, including
reverse-strand and concatemer records, chained into the barcode matcher."""

import numpy as np
import pytest

from nanoranger_tpu import chemistry
from nanoranger_tpu.align.aligner import PanelAligner
from nanoranger_tpu.align.index import PanelIndex
from nanoranger_tpu.io.encode import PAD, decode, encode, revcomp_str
from nanoranger_tpu.stages.decon import run_decon

ADAPTER = "CGCTCTTCCGATCT"
TSO = "TTTCTTATATG"


@pytest.fixture(scope="module")
def panel(module_rng):
    seqs = [module_rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    return PanelIndex.build(["GENE1", "GENE2"], seqs), seqs


def _mkread(rng, transcript, bc="ACGTACGTACGTACGT", umi="AAAAACCCCC",
            junk=25):
    pre = "".join(rng.choice(list("ACGT"), junk))
    return pre + ADAPTER + bc + umi + TSO + decode(transcript), bc, umi


def _run(spec, reads, panel):
    index, _ = panel
    L = ((max(len(r) for r in reads) + 127) // 128) * 128
    codes = np.full((len(reads), L), PAD, np.int8)
    lens = np.zeros(len(reads), np.int32)
    quals = []
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode(r)
        lens[i] = len(r)
        quals.append(b"I" * len(r))
    rec = PanelAligner(index).align(codes, lens)
    names = [f"read{i}" for i in range(len(reads))]
    out = run_decon(spec, codes, lens, names, quals, rec,
                    index.names, sample="t")
    return rec, out


def test_5p10xgex_forward(panel, rng):
    spec = chemistry.get("5p10XGEX")
    index, seqs = panel
    read, bc, umi = _mkread(rng, seqs[0][100:600])
    rec, out = _run(spec, [read], panel)
    assert len(out.bcumi_seqs) == 1
    # bcumi = motif span minus the final base (edlib inclusive-end slice)
    expect = ADAPTER + bc + umi + TSO[:-1]
    assert out.bcumi_seqs[0] == expect
    assert len(out.sub_seqs) == 1
    # subread = aligned transcript span
    assert len(out.sub_seqs[0]) > 450
    assert out.sub_names[0].startswith("read0_")
    assert out.sub_names[0].endswith("_0_GENE1")


def test_5p10xgex_reverse_strand(panel, rng):
    spec = chemistry.get("5p10XGEX")
    index, seqs = panel
    read, bc, umi = _mkread(rng, seqs[1][50:600], bc="TGCATGCATGCATGCA",
                            umi="GGGGGTTTTT")
    rc = revcomp_str(read)
    rec, out = _run(spec, [rc], panel)
    assert len(rec) == 1 and rec.flag[0] == 16
    assert len(out.bcumi_seqs) == 1
    expect = ADAPTER + "TGCATGCATGCATGCA" + "GGGGGTTTTT" + TSO[:-1]
    assert out.bcumi_seqs[0] == expect
    assert out.sub_names[0].endswith("_16_GENE2")


def test_5p10xgex_concatemer_two_bcumis(panel, rng):
    spec = chemistry.get("5p10XGEX")
    index, seqs = panel
    r1, _, _ = _mkread(rng, seqs[0][100:600], umi="AAAAACCCCC")
    r2, _, _ = _mkread(rng, seqs[1][50:550], umi="TTTTTGGGGG")
    rec, out = _run(spec, [r1 + r2], panel)
    assert len(rec) == 2
    assert len(out.bcumi_seqs) == 2
    umis = {s[30:40] for s in out.bcumi_seqs}
    assert umis == {"AAAAACCCCC", "TTTTTGGGGG"}


def test_5p10xgex_no_adapter_no_output(panel, rng):
    spec = chemistry.get("5p10XGEX")
    index, seqs = panel
    read = "".join(rng.choice(list("ACGT"), 30)) + decode(seqs[0][100:600])
    rec, out = _run(spec, [read], panel)
    assert len(rec) == 1
    assert len(out.bcumi_seqs) == 0
    assert len(out.sub_seqs) == 0  # 5p10XGEX subread requires adapter hit


def test_5p10xtcr_subread_without_adapter(panel, rng):
    # 5p10XTCR writes the subread for EVERY record; bcumi only on hit
    spec = chemistry.get("5p10XTCR")
    index, seqs = panel
    read = "".join(rng.choice(list("ACGT"), 30)) + decode(seqs[0][100:600])
    rec, out = _run(spec, [read], panel)
    assert len(out.sub_seqs) == 1
    assert len(out.bcumi_seqs) == 0
    # subread window: [qend-60, qend+80] clamped
    assert len(out.sub_seqs[0]) <= 140


def test_decon_to_barcode_matcher(panel, rng):
    # full 5' slice: decon candidates → matcher (small whitelist incl truth)
    from nanoranger_tpu.io.encode import encode_batch
    from nanoranger_tpu.stages.barcode import ACCEPT, BarcodeMatcher
    spec = chemistry.get("5p10XGEX")
    index, seqs = panel
    wl = ["".join(rng.choice(list("ACGT"), 16)) for _ in range(500)]
    reads, truth = [], []
    for i in range(8):
        bc = wl[rng.integers(0, len(wl))]
        umi = "".join(rng.choice(list("ACGT"), 10))
        r, _, _ = _mkread(rng, seqs[i % 2][50:550], bc=bc, umi=umi)
        reads.append(r)
        truth.append((bc, umi))
    rec, out = _run(spec, reads, panel)
    assert len(out.bcumi_seqs) == 8
    q, qlen = encode_batch(out.bcumi_seqs, max_len=64)
    m = BarcodeMatcher(np.asarray(wl), spec.barcode)
    res = m.match(q, qlen)
    assert (res["status"] == ACCEPT).all()
    got = [(m.barcodes[res["bc_idx"][i]], decode(res["umi"][i]))
           for i in range(8)]
    # bcumi order follows record order == read order here
    assert sorted(got) == sorted(truth)
