"""Full barcode-assignment parity vs the exhaustive arbiter (VERDICT r3
next-step #2): every BC-UMI candidate of TCR3 + 1026_mtDNA scored
against the full 737K whitelist. tools/match_parity.py writes the
report; this test pins its guarantees:

  - every candidate arbitrated (n_candidates > 0, nothing sampled)
  - zero UNEXPLAINED divergences
  - accepted-barcode flips never happen (when both accept, same bc)
  - exact status agreement >= 92%, and >= 95% counting the
    label-only classes (read dropped either way, no artifact effect);
    the remaining accept-direction flips are the measured screened-
    recall classes — noise-floor loci (rc ties / far-offset 14s with
    indels) the exhaustive arbiter sees but a screened matcher does
    not, each visible and classified in the report
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
    assert set(rep["samples"]) >= {"TCR3", "1026_mtDNA_ASXL1_NRAS_SF3B1"}
    for name, s in rep["samples"].items():
        assert s["n_candidates"] > 500, name
        assert s["n_whitelist"] == 737280
        assert s["classes"].get("UNEXPLAINED", 0) == 0, \
            (name, s["divergences"][:3])
        assert s["agreement"] >= 0.92, (name, s["classes"])
        n = s["n_candidates"]
        label_only = s["classes"].get("both_dropped_status_differs", 0)
        assert (s["agree"] + label_only) / n >= 0.95, (name, s["classes"])
        # when both accept, a different barcode is only legitimate as a
        # screen-recall case: the arbiter's barcode must score STRICTLY
        # higher (e.g. a shifted whitelist near-pair where the exhaustive
        # search finds a 15 the screen missed). An equal-score flip would
        # be a tie-logic bug — never allowed.
        for d in s["divergences"]:
            e_bc, e_score, e_status, _ = d["engine"]
            a_bc, a_score, a_status, _ = d["arbiter"]
            if e_status == 0 and a_status == 0 and e_bc != a_bc:
                assert a_score > e_score, d
