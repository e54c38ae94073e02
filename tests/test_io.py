import gzip
import os

import numpy as np
import pytest

from nanoranger_tpu import chemistry
from nanoranger_tpu.io import encode as enc
from nanoranger_tpu.io import fasta, fastq, whitelist

REF_DATA = "/root/reference/data"


def test_encode_roundtrip():
    s = "ACGTNACGT"
    codes = enc.encode(s)
    assert codes.tolist() == [0, 1, 2, 3, 4, 0, 1, 2, 3]
    assert enc.decode(codes) == s


def test_revcomp():
    assert enc.revcomp_str("ACGTN") == "NACGT"
    assert enc.revcomp_str("AACCGGTT") == "AACCGGTT"[::-1].translate(
        str.maketrans("ACGT", "TGCA"))


def test_encode_batch_padding():
    codes, lengths = enc.encode_batch(["ACGT", "AC"], max_len=6)
    assert codes.shape == (2, 6)
    assert lengths.tolist() == [4, 2]
    assert codes[1].tolist() == [0, 1, 5, 5, 5, 5]


def test_pack_2bit_kmers():
    codes = enc.encode("ACGTA")
    keys = enc.pack_2bit_kmers(codes, 3)
    # ACG=0b000110=6, CGT=0b011011=27, GTA=0b101100=44
    assert keys.tolist() == [6, 27, 44]
    keys_n = enc.pack_2bit_kmers(enc.encode("ACNTA"), 3)
    assert (keys_n == -1).tolist() == [True, True, True]


def test_fastq_roundtrip(tmp_path):
    p = str(tmp_path / "x.fastq.gz")
    with fastq.FastqWriter(p) as w:
        w.write("r1 extra", "ACGT", "IIII")
        w.write("r2", "GG", "II")
    recs = list(fastq.iter_fastq(p))
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[0].seq == b"ACGT"
    batch = fastq.read_all(p)
    assert len(batch) == 2
    assert batch.codes.shape[1] % 128 == 0
    assert batch.lengths.tolist() == [4, 2]


def test_fasta_roundtrip(tmp_path):
    p = str(tmp_path / "x.fa")
    with fasta.FastaWriter(p) as w:
        w.write("seq1 desc", "ACGTACGT")
        w.write("seq2", "TTTT")
    names, seqs = fasta.read_fasta_encoded(p)
    assert names == ["seq1", "seq2"]
    assert enc.decode(seqs[0]) == "ACGTACGT"


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_reference_panels_parse():
    names, seqs = fasta.read_fasta_encoded(f"{REF_DATA}/RUNX1_RUNX1T1_ABL1_BCR.fa")
    assert len(names) >= 4
    assert all(len(s) > 100 for s in seqs)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_737k_whitelist():
    bcs = whitelist.load_txt(f"{REF_DATA}/737K-august-2016.txt.gz")
    assert len(bcs) == 737280
    assert all(len(b) == 16 for b in bcs[:100])
    spec = chemistry.get("5p10XGEX").barcode
    codes, ref_len = whitelist.padded_refs(bcs[:64], spec)
    assert ref_len == 30 + 16 + 40
    assert (codes[:, :30] == enc.N).all()
    assert (codes[:, 46:] == enc.N).all()
    assert (codes[:, 30:46] < 4).all()


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference data absent")
def test_slideseq_whitelist():
    bcs = whitelist.load_slideseq(f"{REF_DATA}/slideseq.matched.barcodes.tsv.gz")
    assert len(bcs) == 17753 or len(bcs) > 10000  # uniqued
    spec = chemistry.get("3pXCR_slideseq").barcode
    codes, ref_len = whitelist.padded_refs(bcs[:8], spec)
    # N*15 + 8 + 18-nt linker + 6 + N*24 = 71
    assert ref_len == 15 + 8 + 18 + 6 + 24


def test_chemistry_registry_complete():
    assert set(chemistry.names()) == {
        "5p10XGEX", "5p10XTCR", "RTX", "3pXCR_slideseq",
        "3p10XTCR", "3p10XTCR_nuc", "3p10XGEX"}
    g = chemistry.get("5p10XGEX")
    assert len(g.scan.pattern) == 51
    assert g.barcode.umi_ref_offset == 46
    t = chemistry.get("3p10XTCR")
    assert len(t.scan.pattern) == 54
    s = chemistry.get("3pXCR_slideseq")
    assert s.scan.pattern == "TCTCGGGAACGCTGAAGA"


def test_native_fastq_reader_matches_python(tmp_path, rng):
    """Native (C++) reader must produce byte-identical batches to the
    Python parser, for gz and plain files, including truncation."""
    import gzip as _gzip

    import nanoranger_tpu.runtime.native_lib as nl
    from nanoranger_tpu.io import fastq

    if nl.get_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable")

    recs = []
    for i in range(300):
        n = int(rng.integers(5, 900))
        seq = "".join(rng.choice(list("ACGTN"), n))
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, n))
        recs.append((f"read-{i} extra info", seq, qual))
    body = "".join(f"@{n}\n{s}\n+\n{q}\n" for n, s, q in recs)
    plain = tmp_path / "a.fastq"
    plain.write_text(body)
    gz = tmp_path / "a.fastq.gz"
    with _gzip.open(gz, "wt") as f:
        f.write(body)

    class _Boom:
        def __init__(self, *a, **k):
            raise OSError("forced python path")

    for path in (str(plain), str(gz)):
        nat = list(fastq.iter_batches(path, 128, max_len=512))
        orig = nl.NativeFastqReader
        nl.NativeFastqReader = _Boom
        try:
            py = list(fastq.iter_batches(path, 128, max_len=512))
        finally:
            nl.NativeFastqReader = orig
        assert len(nat) == len(py) == 3
        for a, b in zip(nat, py):
            assert a.names == b.names
            assert a.quals == b.quals
            assert (a.lengths == b.lengths).all()
            assert a.codes.shape == b.codes.shape
            assert (a.codes == b.codes).all()
    # names keep only the first whitespace token (pysam qname semantics)
    assert nat[0].names[0] == "read-0"
