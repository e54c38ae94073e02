"""BAM reader round-trip + downstream utilities over a written tagged BAM."""

import numpy as np

from nanoranger_tpu.io.bam import BAMWriter, read_bam
from nanoranger_tpu.io.encode import encode


def _write_test_bam(path):
    with BAMWriter(path, ["chrA", "chrB"], [500, 300]) as w:
        w.write("r1", 0, 0, 100, 60,
                [(5, "S"), (10, "="), (1, "X"), (9, "=")],
                encode("AAAAA" + "ACGTACGTAC" + "T" + "ACGTACGTA"),
                b"I" * 25, tags={"CB": "BC1", "UB": "UMI1", "XT": "g1",
                                 "NM": 1})
        w.write("r2", 16, 0, 150, 60,
                [(8, "="), (2, "D"), (8, "="), (3, "S")],
                encode("ACGTACGT" + "ACGTACGT" + "GGG"),
                b"I" * 19, tags={"CB": "BC2", "UB": "UMI2", "XT": "g1"})
        w.write("r3", 0, 1, 50, 60, [(20, "=")],
                encode("ACGT" * 5), b"I" * 20,
                tags={"CB": "BC3", "UB": "UMI3", "XT": "g2"})


def test_bam_reader_roundtrip(tmp_path):
    p = str(tmp_path / "t.bam")
    _write_test_bam(p)
    names, lens, recs = read_bam(p)
    recs = list(recs)
    assert names == ["chrA", "chrB"] and lens == [500, 300]
    assert len(recs) == 3
    r1 = recs[0]
    assert (r1.name, r1.flag, r1.pos) == ("r1", 0, 100)
    assert r1.reference_end == 120
    assert r1.query_alignment_length == 20
    assert r1.tags["CB"] == "BC1" and r1.tags["NM"] == 1
    r2 = recs[1]
    assert r2.reference_end == 150 + 8 + 2 + 8
    # aligned pairs skip the deletion
    pairs = dict((rp, qp) for qp, rp in r2.aligned_pairs() if qp is not None)
    assert pairs[150] == 0 and pairs[160] == 8
    assert 158 not in pairs

    # query_pos_at: r1 mismatch base at ref 110 (the X op: 5S 10= 1X 9=)
    q, indel = r1.query_pos_at(110)
    assert r1.seq[q] == "T"
    qd, _ = r2.query_pos_at(158)    # deleted column
    assert qd is None
    assert r2.overlap(150, 170) == 16


def test_fusion_and_pileup_tools(tmp_path):
    p = str(tmp_path / "t.bam")
    _write_test_bam(p)
    out = str(tmp_path / "fus.csv")
    from nanoranger_tpu.downstream.fusion_gene import main as fus_main
    fus_main(["--bam", p, "--output", out])
    import pandas as pd
    df = pd.read_csv(out)
    assert len(df) == 3
    assert set(df.BC) == {"BC1", "BC2", "BC3"}

    from nanoranger_tpu.downstream.pileup import pileup_at
    rows = pileup_at(p, "chrA", 110)
    assert rows == [["BC1", "UMI1", "T", ord("I") - 33, 0]]
    rows2 = pileup_at(p, "chrA", 152)
    assert [r[0] for r in rows2] == ["BC2"]
