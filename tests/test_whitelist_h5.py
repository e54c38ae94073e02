"""Cell-called whitelist ingestion from 10x .h5 (reference
utils.py:606-610 scanpy min_genes=20 and utils.py:1117-1123 min_genes=4
for 3p10XTCR_nuc) — VERDICT r2 partial #16: load_h5 previously had no
fixture and never ran in CI."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
sp = pytest.importorskip("scipy.sparse")


def _write_10x_h5(path, barcodes, genes_per_cell, n_genes=50):
    """Synthetic cellranger-style h5: CSC matrix, cells as columns, each
    cell expressing its requested number of genes."""
    cols = []
    for g in genes_per_cell:
        col = np.zeros(n_genes, np.int32)
        col[:g] = 1
        cols.append(col)
    mat = sp.csc_matrix(np.stack(cols, axis=1))
    with h5py.File(path, "w") as f:
        grp = f.create_group("matrix")
        grp.create_dataset("barcodes",
                           data=np.asarray([b.encode() for b in barcodes]))
        grp.create_dataset("data", data=mat.data)
        grp.create_dataset("indices", data=mat.indices)
        grp.create_dataset("indptr", data=mat.indptr)
        grp.create_dataset("shape", data=np.asarray(mat.shape))


def test_load_h5_min_genes(tmp_path):
    from nanoranger_tpu.io import whitelist
    bcs = ["ACGTACGTACGTACGT-1", "CCCCACGTACGTACGT-1",
           "GGGGACGTACGTACGT-1", "TTTTACGTACGTACGT-1"]
    path = str(tmp_path / "cells.h5")
    _write_10x_h5(path, bcs, genes_per_cell=[25, 20, 4, 1])
    # utils.py:608: sc.pp.filter_cells(min_genes=20) keeps >= 20
    got = whitelist.load_h5(path, min_genes=20)
    assert list(got) == ["ACGTACGTACGTACGT", "CCCCACGTACGTACGT"]
    # nuc mode threshold (utils.py:1120: min_genes=4)
    got4 = whitelist.load_h5(path, min_genes=4)
    assert list(got4) == ["ACGTACGTACGTACGT", "CCCCACGTACGTACGT",
                          "GGGGACGTACGTACGT"]


def test_load_dispatches_h5(tmp_path):
    from nanoranger_tpu.io import whitelist
    path = str(tmp_path / "cells.h5")
    _write_10x_h5(path, ["AAAACCCCGGGGTTTT-1"], genes_per_cell=[30])
    got = whitelist.load(path, min_genes=4)
    assert list(got) == ["AAAACCCCGGGGTTTT"]


def test_h5_whitelist_through_matcher(tmp_path):
    """The h5 route feeds the same matcher path as txt whitelists
    (3p10XTCR_nuc's only whitelist source, reference utils.py:1117-1123)."""
    from nanoranger_tpu import chemistry
    from nanoranger_tpu.io import whitelist
    from nanoranger_tpu.io.encode import encode_batch
    from nanoranger_tpu.stages.barcode import ACCEPT, BarcodeMatcher
    rng = np.random.default_rng(3)
    bcs = ["".join(rng.choice(list("ACGT"), 16)) + "-1" for _ in range(32)]
    path = str(tmp_path / "cells.h5")
    _write_10x_h5(path, bcs, genes_per_cell=[10] * 32)
    wl = whitelist.load(path, min_genes=4)
    spec = chemistry.get("3p10XTCR_nuc").barcode
    m = BarcodeMatcher(wl, spec)
    # candidate: 7nt truseq-rc prefix + bc + 12nt umi (chemistry.py rc7)
    bc = wl[5]
    umi = "".join(rng.choice(list("ACGT"), 12))
    q, qlen = encode_batch(["GATCGGA"[:7] + bc + umi + "AAAA"], max_len=96)
    r = m.match(q, qlen)
    assert r["status"][0] == ACCEPT and r["bc_idx"][0] == 5
