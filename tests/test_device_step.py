"""Fused device step vs the streamed path: identical accepted
(read, barcode, UMI, gene) assignments for 5' and 3' chemistries."""

import numpy as np
import pytest

from nanoranger_tpu import chemistry
from nanoranger_tpu.align.aligner import PanelAligner
from nanoranger_tpu.align.index import PanelIndex
from nanoranger_tpu.chemistry import TRUSEQ
from nanoranger_tpu.io.encode import PAD, decode, encode, encode_batch, \
    revcomp_str
from nanoranger_tpu.stages.barcode import ACCEPT, BarcodeMatcher
from nanoranger_tpu.stages.decon import run_decon
from nanoranger_tpu.stages.device_step import build_device_step


def _streamed(spec, index, codes, lens, names, quals, matcher):
    rec = PanelAligner(index).align(codes, lens)
    out = run_decon(spec, codes, lens, names, quals, rec, index.names, "t")
    q, qlen = encode_batch(out.bcumi_seqs, max_len=96)
    r = matcher.match(q, qlen)
    got = set()
    for k in np.where(r["status"] == ACCEPT)[0]:
        read = int(rec.read_idx[out.bcumi_rec[k]])
        gene = index.names[int(rec.ref_id[out.bcumi_rec[k]])]
        got.add((read, int(r["bc_idx"][k]),
                 decode(r["umi"][k]), gene))
    return got


def _fused(spec, index, codes, lens, matcher):
    step = build_device_step(spec, index, matcher, S=2, max_minimizers=256)
    r = {k: np.asarray(v) for k, v in step(codes, lens).items()}
    assert int(r["n_deferred"]) == 0
    got = set()
    B, S = r["status"].shape
    for i in range(B):
        for s in range(S):
            if r["status"][i, s] == ACCEPT:
                got.add((i, int(r["bc_idx"][i, s]),
                         decode(r["umi"][i, s]),
                         index.names[int(r["ref_id"][i, s])]))
    return got


@pytest.mark.parametrize("mode", ["5p10XGEX", "3p10XGEX"])
def test_device_step_matches_streamed(rng, mode):
    spec = chemistry.get(mode)
    refs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    index = PanelIndex.build(["GENEA", "GENEB"], refs)
    bcs = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(24)})
    matcher = BarcodeMatcher(np.asarray(bcs), spec.barcode)

    reads = []
    for i in range(48):
        bc = bcs[i % len(bcs)]
        gene = refs[i % 2][50:650]
        if mode == "5p10XGEX":
            umi = "".join(rng.choice(list("ACGT"), 10))
            pre = "".join(rng.choice(list("ACGT"), 25))
            r = (pre + "CGCTCTTCCGATCT" + bc + umi + "TTTCTTATATG"
                 + decode(gene))
        else:
            umi = "".join(rng.choice(list("ACGT"), 12))
            r = (decode(gene) + "ACGC" + revcomp_str(umi) + revcomp_str(bc)
                 + TRUSEQ + "".join(rng.choice(list("ACGT"), 25)))
        reads.append(r)

    L = ((max(map(len, reads)) + 127) // 128) * 128
    codes = np.full((len(reads), L), PAD, np.int8)
    lens = np.zeros(len(reads), np.int32)
    quals = []
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode(r)
        lens[i] = len(r)
        quals.append(b"I" * len(r))
    names = [f"r{i}" for i in range(len(reads))]

    streamed = _streamed(spec, index, codes, lens, names, quals, matcher)
    fused = _fused(spec, index, codes, lens, matcher)
    assert len(streamed) >= 40
    assert fused == streamed


def _pack(reads):
    L = ((max(map(len, reads)) + 127) // 128) * 128
    codes = np.full((len(reads), L), PAD, np.int8)
    lens = np.zeros(len(reads), np.int32)
    quals = []
    for i, r in enumerate(reads):
        codes[i, :len(r)] = encode(r)
        lens[i] = len(r)
        quals.append(b"I" * len(r))
    return codes, lens, quals, [f"r{i}" for i in range(len(reads))]


def _streamed_statuses(spec, index, codes, lens, names, quals, matcher):
    """Per-candidate (read, status, bc_idx, umi) rows from the streamed
    path — covers non-ACCEPT statuses too (3p10XTCR's slideseq-linker
    whitelist rarely accepts, but the gating must still agree)."""
    rec = PanelAligner(index).align(codes, lens)
    out = run_decon(spec, codes, lens, names, quals, rec, index.names, "t")
    q, qlen = encode_batch(out.bcumi_seqs, max_len=96)
    r = matcher.match(q, qlen)
    rows = set()
    for k in range(len(out.bcumi_rec)):
        read = int(rec.read_idx[out.bcumi_rec[k]])
        rows.add((read, int(r["status"][k]), int(r["bc_idx"][k]),
                  decode(r["umi"][k])))
    return rows


def _fused_statuses(spec, index, codes, lens, matcher):
    step = build_device_step(spec, index, matcher, S=2, max_minimizers=256)
    r = {k: np.asarray(v) for k, v in step(codes, lens).items()}
    assert int(r["n_deferred"]) == 0
    rows = set()
    B, S = r["status"].shape
    for i in range(B):
        for s in range(S):
            if r["status"][i, s] != 5:          # 5 = no adapter hit
                rows.add((i, int(r["status"][i, s]),
                          int(r["bc_idx"][i, s]),
                          decode(r["umi"][i, s])))
    return rows


def test_device_step_matches_streamed_3p10xtcr(rng):
    # rev_slice14 rule + qlen>100 subread gate (fused vs streamed)
    spec = chemistry.get("3p10XTCR")
    refs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    index = PanelIndex.build(["TRAC-X", "TRBC-X"], refs)
    beads = sorted({"".join(rng.choice(list("ACGT"), 14)) for _ in range(16)})
    matcher = BarcodeMatcher(np.asarray(beads), spec.barcode)
    reads = []
    for i in range(24):
        vdj = "".join(rng.choice(list("ACGT"), 400))
        x28 = "".join(rng.choice(list("ACGT"), 28))
        tail = "".join(rng.choice(list("ACGT"), 20))
        reads.append(vdj + decode(refs[i % 2][50:650]) + "AAAAAA" + x28
                     + TRUSEQ + tail)
    codes, lens, quals, names = _pack(reads)
    streamed = _streamed_statuses(spec, index, codes, lens, names, quals,
                                  matcher)
    fused = _fused_statuses(spec, index, codes, lens, matcher)
    assert len(streamed) >= 20              # every read yields a candidate
    assert fused == streamed


def test_device_step_matches_streamed_3p10xtcr_nuc(rng):
    # rev_nuc rule incl. the gs>=35 wraparound reject (fused vs streamed)
    spec = chemistry.get("3p10XTCR_nuc")
    refs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    index = PanelIndex.build(["TRBV1-X", "TRBV2-X"], refs)
    bcs = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(24)})
    matcher = BarcodeMatcher(np.asarray(bcs), spec.barcode)
    reads = []
    for i in range(32):
        bc = bcs[i % len(bcs)]
        umi = "".join(rng.choice(list("ACGT"), 12))
        tail = "".join(rng.choice(list("ACGT"), 25))
        if i % 8 == 7:
            # adapter too close to qend: gs<35 → python-wraparound reject
            flank = "AA" + TRUSEQ + tail
        else:
            flank = ("A" * 10 + revcomp_str(umi) + revcomp_str(bc)
                     + TRUSEQ + tail)
        reads.append(decode(refs[i % 2][50:650]) + flank)
    codes, lens, quals, names = _pack(reads)
    streamed = _streamed_statuses(spec, index, codes, lens, names, quals,
                                  matcher)
    fused = _fused_statuses(spec, index, codes, lens, matcher)
    accepted = {r for r in streamed if r[1] == ACCEPT}
    assert len(accepted) >= 20              # well-formed reads accept
    assert fused == streamed


def test_device_step_spill_pass_concatemers(rng):
    """Adapter-rich batch: hits exceed the 0.75·B·S compaction budget, so
    the conditional second match pass must run — no hit may be left with
    the no-adapter status (the round-1 silent-deferral hazard)."""
    spec = chemistry.get("5p10XGEX")
    refs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 700)]
    index = PanelIndex.build(["GENEA", "GENEB"], refs)
    bcs = sorted({"".join(rng.choice(list("ACGT"), 16)) for _ in range(24)})
    matcher = BarcodeMatcher(np.asarray(bcs), spec.barcode)
    reads = []
    for i in range(8):
        segs = []
        for s in range(2):                  # every read a 2-mer concatemer
            bc = bcs[(2 * i + s) % len(bcs)]
            umi = "".join(rng.choice(list("ACGT"), 10))
            pre = "".join(rng.choice(list("ACGT"), 25))
            segs.append(pre + "CGCTCTTCCGATCT" + bc + umi + "TTTCTTATATG"
                        + decode(refs[s][50:650]))
        reads.append("".join(segs))
    codes, lens, quals, names = _pack(reads)
    streamed = _streamed(spec, index, codes, lens, names, quals, matcher)
    step = build_device_step(spec, index, matcher, S=2, max_minimizers=256)
    r = {k: np.asarray(v) for k, v in step(codes, lens).items()}
    n_hits = int((r["status"] != 5).sum())
    assert n_hits == 16                     # 2 per read: budget M=12 < 16
    assert int(r["n_deferred"]) == 0
    fused = _fused(spec, index, codes, lens, matcher)
    assert len(streamed) == 16
    assert fused == streamed
