"""Genome-scale spliced alignment (minimap2 -x splice analogue).

Covers VERDICT r1 missing #1: streaming index build for multi-Mb
references (bit-identical chunked sketching), intron-tolerant chaining,
exon-block extraction, and the genome stage emitting N CIGAR ops —
matching reference scripts/align_genome.sh:9 semantics.
"""

import numpy as np
import pytest

from nanoranger_tpu.align.aligner import PanelAligner
from nanoranger_tpu.align.index import PanelIndex, _sketch_chunked
from nanoranger_tpu.align.minimizers import sketch_batch
from nanoranger_tpu.io.encode import PAD


def _whole_sketch(code):
    L = len(code)
    Lp = -(-L // 128) * 128
    codes = np.full((1, Lp), PAD, np.int8)
    codes[0, :L] = code
    h, p, s, cnt = sketch_batch(codes, np.asarray([L], np.int32), Lp)
    c = int(cnt[0])
    return np.asarray(h[0, :c]), np.asarray(p[0, :c]), np.asarray(s[0, :c])


def test_chunked_sketch_bit_identical(rng):
    code = rng.integers(0, 4, size=300_000).astype(np.int8)
    h0, p0, s0 = _whole_sketch(code)
    h1, p1, s1 = _sketch_chunked(code, chunk=1 << 14, rows=4)
    np.testing.assert_array_equal(p1, p0)
    np.testing.assert_array_equal(h1, h0)
    np.testing.assert_array_equal(s1, s0)


@pytest.fixture(scope="module")
def big_genome(module_rng):
    """~12 Mb single-reference genome with a known 3-exon gene."""
    n = 12_000_000
    genome = module_rng.integers(0, 4, size=n).astype(np.int8)
    gene_start = 7_000_000
    exon_lens = [400, 350, 500]
    intron_lens = [3_000, 12_000]
    exons = []
    pos = gene_start
    for i, el in enumerate(exon_lens):
        exons.append((pos, pos + el))
        pos += el
        if i < len(intron_lens):
            pos += intron_lens[i]
    index = PanelIndex.build(["chr_big"], [genome])
    return index, genome, exons


def test_streaming_index_build(big_genome):
    index, genome, _ = big_genome
    assert index.ref_lens[0] == len(genome)
    # local coords stay int32 and within the reference
    assert index.tpos.dtype == np.int32
    assert index.tpos.max() < len(genome)
    # healthy minimizer density ~ 2/(W+1)
    dens = len(index.hashes) / len(genome)
    assert 0.1 < dens < 0.3


def test_intron_spanning_alignment(big_genome, rng):
    index, genome, exons = big_genome
    read = np.concatenate(
        [rng.integers(0, 4, 60).astype(np.int8)] +
        [genome[a:b] for a, b in exons] +
        [rng.integers(0, 4, 50).astype(np.int8)])
    L = -(-len(read) // 128) * 128
    codes = np.full((1, L), PAD, np.int8)
    codes[0, :len(read)] = read
    lens = np.asarray([len(read)], np.int32)

    aligner = PanelAligner(index, preset="splice")
    rec, blocks = aligner.align_with_exons(codes, lens)
    assert len(rec) == 1, "intron-spanning read must yield ONE spliced record"
    assert rec.flag[0] == 0
    # the record spans the whole gene on the target...
    assert abs(rec.tstart[0] - exons[0][0]) <= 25
    assert abs(rec.tend[0] - exons[-1][1]) <= 25
    # ...and the whole exonic part of the query
    assert abs(rec.qstart[0] - 60) <= 25
    assert abs(rec.qend[0] - (60 + sum(b - a for a, b in exons))) <= 25
    # exon blocks recover the gene structure with intron-sized gaps
    bl = blocks[0]
    assert len(bl) == 3
    for (t_lo, t_hi, _, _), (a, b) in zip(bl, exons):
        assert abs(t_lo - a) <= 25 and abs(t_hi - b) <= 25
    gap1 = bl[1][0] - bl[0][1]
    gap2 = bl[2][0] - bl[1][1]
    assert abs(gap1 - 3_000) <= 50
    assert abs(gap2 - 12_000) <= 50


def test_map_ont_unaffected_by_splice_plumbing(rng):
    """Panel-sized references: the seg-coordinate refactor must leave the
    map-ont path's records unchanged in structure (MT-style use)."""
    seqs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (900, 1400)]
    index = PanelIndex.build(["g1", "g2"], seqs)
    read = seqs[1][200:1000]
    L = -(-len(read) // 128) * 128
    codes = np.full((1, L), PAD, np.int8)
    codes[0, :len(read)] = read
    lens = np.asarray([len(read)], np.int32)
    r0 = PanelAligner(index).align(codes, lens)
    r1 = PanelAligner(index, preset="splice").align(codes, lens)
    for fld in ("read_idx", "ref_id", "strand", "flag", "qstart", "qend",
                "tstart", "tend"):
        np.testing.assert_array_equal(getattr(r0, fld), getattr(r1, fld))
    assert r0.ref_id[0] == 1 and r0.flag[0] == 0


def test_genome_stage_emits_intron_N_ops(big_genome, rng, tmp_path):
    from nanoranger_tpu import chemistry
    from nanoranger_tpu.io import fasta, fastq
    from nanoranger_tpu.io.bam import read_bam
    from nanoranger_tpu.io.encode import decode
    from nanoranger_tpu.pipeline import genome_stage

    index, genome, exons = big_genome
    gfa = tmp_path / "big.fa"
    with open(gfa, "w") as f:
        f.write(">chr_big\n" + decode(genome) + "\n")

    read = np.concatenate([genome[a:b] for a, b in exons])
    name = "read1_10_1200_0_GENE"
    sub = tmp_path / "s_deconcat.fastq.gz"
    with fastq.FastqWriter(str(sub)) as w:
        w.write(name, decode(read), "I" * len(read))

    outdir = str(tmp_path)
    spec = chemistry.get("5p10XGEX")
    genome_stage(spec, outdir, "s", str(gfa),
                 {name: ("ACGT" * 4, "ACGTACGTAC", "GENE")})
    _, _, it = read_bam(f"{outdir}/s_genome_tagged.bam")
    recs = list(it)
    assert len(recs) == 1
    r = recs[0]
    n_ops = [n for (n, op) in r.cigar if op == "N"]
    assert len(n_ops) == 2
    assert abs(n_ops[0] - 3_000) <= 50 and abs(n_ops[1] - 12_000) <= 50
    assert r.tags["XT"] == "GENE"
    # reference span must cover the whole gene (exons + introns)
    span = sum(n for n, op in r.cigar if op in "=XDN")
    want = exons[-1][1] - exons[0][0]
    assert abs(span - want) <= 50
