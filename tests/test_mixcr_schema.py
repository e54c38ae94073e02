"""MiXCR-boundary validation (round-4 VERDICT #8): the native
clonotyper's exports are structurally compatible with real MiXCR v3
exports in BOTH directions, and the assembleContigs analogue populates
clone-consensus contigs.

  producing: vdj/clonotype.write_exports columns are a subset of what
      the reference's MiXCR invocation produces (scripts/mixcr.sh:15-22,
      schema fixture tests/goldens/mixcr_schema.json) — any consumer of
      real MiXCR tables can read ours.
  consuming: stages/clones.clone_filt_* reads the FIXTURE rows (real
      MiXCR-formatted values: allele*00(score) hit lists, refPoints,
      mapping types) — a user can hand the pipeline real MiXCR exports.
"""

import gzip
import json
import os

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "tests", "goldens", "mixcr_schema.json")

with open(FIX) as _f:
    SCHEMA = json.load(_f)


def _mk_calls():
    from nanoranger_tpu.vdj.clonotype import ReadCall
    jx = "TGTGCCAGCAGCTTAGCGGGACAGTACTTC"        # 30 nt junction
    jx2 = "TGTGCTGTGAGTGATCTTGAACAGCTTT"
    calls = []
    for k in range(5):
        # same clone -> same V context; members differ in COVERAGE
        # (left-truncated starts), as clonal long reads do
        pre = "GGACTCAGC"[k % 3:]
        calls.append(ReadCall(
            name=f"r{k}", v_name="TRBV1-1", v_score=100, chain="TRB",
            cdr3_nt=jx, cdr3_aa="CASSLAGQYF", seq=pre + jx + "GGAGGC"))
    for k in range(2):
        calls.append(ReadCall(
            name=f"s{k}", v_name="TRAV2", v_score=90, chain="TRA",
            cdr3_nt=jx2, cdr3_aa="CAVSDLEQLF", seq="CCTT" + jx2 + "AA"))
    return calls, jx, jx2


def test_export_columns_subset_of_mixcr():
    from nanoranger_tpu.vdj.clonotype import assemble, write_exports
    calls, _, _ = _mk_calls()
    clones, cloneID = assemble(calls)
    assert set(clones.columns) <= set(SCHEMA["export_clones_columns"]), \
        set(clones.columns) - set(SCHEMA["export_clones_columns"])
    assert set(cloneID.columns) <= set(SCHEMA["export_alignments_columns"])


def test_clone_filt_consumes_real_mixcr_tables(tmp_path):
    """Write the fixture's REAL-MiXCR-shaped rows as the export files and
    run the reference's clone filter over them."""
    from nanoranger_tpu.stages.clones import clone_filt_5p10X
    clones = pd.DataFrame(SCHEMA["sample_clone_rows"],
                          columns=SCHEMA["export_clones_columns"])
    aligns = pd.DataFrame(SCHEMA["sample_alignment_rows"],
                          columns=SCHEMA["export_alignments_columns"])
    clones.to_csv(tmp_path / "t_clones.txt.gz", sep="\t", index=False)
    aligns.to_csv(tmp_path / "t_cloneID.txt.gz", sep="\t", index=False)
    cl, cid = clone_filt_5p10X("t", str(tmp_path))
    # cloneCount>1 filter keeps clones 0/1 and drops the singleton
    assert set(cl.cloneId) == {0, 1}
    # reads joined by name; the dropped clone's read disappears
    assert "read1_100_400_0_TRBV12-3-201|ENST0001_300" in cid.index
    assert (tmp_path / "t_clones_filtered.csv").is_file()


def test_assemble_contigs_consensus():
    """assembleContigs analogue: targetSequences holds the junction-
    anchored member consensus, spanning beyond the junction itself."""
    from nanoranger_tpu.vdj.clonotype import assemble
    calls, jx, jx2 = _mk_calls()
    clones, cloneID = assemble(calls)
    assert "targetSequences" in clones.columns
    row = clones[clones.chains == "TRB"].iloc[0]
    contig = row.targetSequences
    assert jx in contig
    assert len(contig) > len(jx)          # V context + downstream bases
    # the majority V-context (k%3==0 rows: 'GGACTCAGC' directly before
    # the junction) wins the vote upstream of the junction
    assert "GGACTCAGC" + jx in contig
    row2 = clones[clones.chains == "TRA"].iloc[0]
    assert "CCTT" + jx2 + "AA" == row2.targetSequences
