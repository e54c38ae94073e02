"""Full barcode-assignment parity vs the exhaustive arbiter: every
BC-UMI candidate of TCR3 + 1026_mtDNA scored against the full 737K
whitelist. tools/match_parity.py writes the report; this test pins its
guarantees.

Round 5: the matcher is exact by construction (tier hash passes +
exhaustive one-vs-all DP, stages/barcode.py), so agreement with the
arbiter is no longer a recall measurement — it cross-validates two
independent implementations of the same STAR semantics (the engine's
flipped one-vs-all kernel vs the arbiter's per-pair column-major
scorer).  The contract is therefore (near-)total agreement:

  - every candidate arbitrated (n_candidates > 0, nothing sampled)
  - zero UNEXPLAINED divergences
  - agreement >= 0.995 per sample (round-4 screened engine: 0.936/0.945;
    round-4 VERDICT #1 demanded >= 0.995)
  - when both accept, the barcode and UMI agree — no flips at all
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(REPO, "tests", "goldens", "match_parity.json")


@pytest.mark.skipif(not os.path.isfile(PATH),
                    reason="run tools/match_parity.py first")
def test_full_match_parity():
    with open(PATH) as f:
        rep = json.load(f)
    assert rep["whitelist"] == "737K-august-2016"
    # all four matching geometries arbitrated (round-4 VERDICT #6):
    # 30/40 5' (TCR3, 1026), slideseq 8+linker+6, nuc 16/28
    assert set(rep["samples"]) >= {"TCR3", "1026_mtDNA_ASXL1_NRAS_SF3B1",
                                   "slideseq_XCR", "nuc_synthetic"}
    for name, s in rep["samples"].items():
        assert s["n_candidates"] > 500, name
        if name in ("TCR3", "1026_mtDNA_ASXL1_NRAS_SF3B1"):
            assert s["n_whitelist"] == 737280
        assert s["classes"].get("UNEXPLAINED", 0) == 0, \
            (name, s["divergences"][:3])
        assert s["agreement"] >= 0.995, (name, s["classes"])
        # both-accept rows must agree exactly — an accepted-barcode or
        # UMI flip between two exact implementations is a bug
        for d in s["divergences"]:
            e_bc, e_score, e_status, _ = d["engine"]
            a_bc, a_score, a_status, _ = d["arbiter"]
            assert not (e_status == 0 and a_status == 0), d
