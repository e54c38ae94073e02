"""BAM writer round-trip (validated byte-level against the spec) and the
native banded aligner (C++ vs numpy oracle)."""

import gzip
import struct

import numpy as np
import pytest

from nanoranger_tpu.io.bam import BAMWriter, SAMWriter
from nanoranger_tpu.io.encode import encode
from nanoranger_tpu.runtime.native_lib import (_banded_align_numpy,
                                               banded_align_batch, get_lib)


def _read_bgzf(path):
    out = b""
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        assert data[pos:pos+2] == b"\x1f\x8b"
        xlen = struct.unpack("<H", data[pos+10:pos+12])[0]
        extra = data[pos+12:pos+12+xlen]
        assert extra[:4] == b"\x42\x43\x02\x00"
        bsize = struct.unpack("<H", extra[4:6])[0] + 1
        comp = data[pos+12+xlen:pos+bsize-8]
        out += zlib_decompress(comp)
        pos += bsize
    return out


def zlib_decompress(b):
    import zlib
    return zlib.decompress(b, -15)


def test_bam_roundtrip(tmp_path):
    p = str(tmp_path / "x.bam")
    with BAMWriter(p, ["chr1"], [1000]) as w:
        w.write("r1", 0, 0, 100, 60, [(4, "S"), (8, "=")],
                encode("ACGTACGTACGT"), b"IIIIIIIIIIII",
                tags={"CB": "ACGT", "AS": 15})
    raw = _read_bgzf(p)
    assert raw[:4] == b"BAM\x01"
    l_text = struct.unpack("<i", raw[4:8])[0]
    text = raw[8:8+l_text].decode()
    assert "@SQ\tSN:chr1\tLN:1000" in text
    off = 8 + l_text
    n_ref = struct.unpack("<i", raw[off:off+4])[0]
    assert n_ref == 1
    # skip ref block
    off += 4
    lname = struct.unpack("<i", raw[off:off+4])[0]
    off += 4 + lname + 4
    # one alignment record
    bs = struct.unpack("<i", raw[off:off+4])[0]
    rec = raw[off+4:off+4+bs]
    ref_id, pos = struct.unpack("<ii", rec[:8])
    assert (ref_id, pos) == (0, 100)
    l_rn = rec[8]
    flag = struct.unpack("<H", rec[14:16])[0]
    l_seq = struct.unpack("<i", rec[16:20])[0]
    assert flag == 0 and l_seq == 12
    name = rec[32:32+l_rn-1].decode()
    assert name == "r1"


def test_gzip_readable_by_stdlib(tmp_path):
    # BGZF is valid multi-member gzip: python gzip must decompress it
    p = str(tmp_path / "y.bam")
    with BAMWriter(p, ["c"], [10]) as w:
        pass
    with gzip.open(p, "rb") as f:
        assert f.read()[:4] == b"BAM\x01"


def test_native_lib_builds():
    assert get_lib() is not None, "C++ native lib failed to build"


def test_banded_align_exact():
    q = encode("ACGTACGTAC")
    cig, sc, nm = banded_align_batch([q], [q])
    assert cig == ["10="]
    assert nm[0] == 0


def test_banded_align_mismatch_indel():
    q = encode("ACGTTCGTAC")          # 1 mismatch at pos 4
    t = encode("ACGTACGTAC")
    cig, sc, nm = banded_align_batch([q], [t])
    assert cig == ["4=1X5="]
    assert nm[0] == 1
    q2 = encode("ACGTCGTAC")          # deletion of ref base
    cig, sc, nm = banded_align_batch([q2], [t])
    assert cig[0] in ("4=1D5=", "3=1D6=")
    assert nm[0] == 1


@pytest.mark.parametrize("trial", range(4))
def test_native_matches_numpy_oracle(rng, trial):
    lq = int(rng.integers(20, 120))
    q = rng.integers(0, 4, lq).astype(np.int8)
    # target = query with some edits
    t = list(q)
    for _ in range(int(rng.integers(0, 6))):
        op = rng.integers(0, 3)
        p = int(rng.integers(0, len(t)))
        if op == 0:
            t[p] = (t[p] + 1) % 4
        elif op == 1 and len(t) > 10:
            del t[p]
        else:
            t.insert(p, int(rng.integers(0, 4)))
    t = np.asarray(t, np.int8)
    cig_c, sc_c, nm_c = banded_align_batch([q], [t], band=32)
    cig_n, sc_n, nm_n = _banded_align_numpy([q], [t], band=32)
    assert sc_c[0] == sc_n[0], (cig_c, cig_n)
    # cigar consistency: query/ref lengths must be consumed exactly
    import re
    def consume(cig):
        ql = rl = 0
        for n, op in re.findall(r"(\d+)([=XIDSN])", cig):
            n = int(n)
            if op in "=XI":
                ql += n
            if op in "=XDN":
                rl += n
        return ql, rl
    assert consume(cig_c[0]) == (lq, len(t))
