"""Barcode whitelist ingestion — every input format the reference accepts.

Formats (reference write_bc_* functions):
  - plain txt(.gz), one barcode per line, optional '-1' suffix  (utils.py:611-613)
  - 10x cellranger .h5 with min_genes cell calling              (utils.py:606-610,1117-1123)
  - Slide-seq 'BeadBarcodes' comma-split format                  (utils.py:589-590)
  - Slide-seq 'matched' tsv with '-1' suffix                     (utils.py:592-593)
  - data-driven: observed raw-bc counts>min_count ∩ master list  (utils.py:1439-1447)

Output is always a sorted-unique numpy array of barcode strings plus the
padded 'barcode read' matrix used by the matcher (pads from ChemistrySpec).
"""

from __future__ import annotations

import gzip

import numpy as np

from ..chemistry import SLIDESEQ_LINKER, BarcodeMatchSpec
from .encode import N, encode_batch


def _read_lines(path: str) -> list[str]:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return [ln.strip() for ln in f if ln.strip()]


def load_txt(path: str) -> np.ndarray:
    """Plain whitelist; strips cellranger '-1' suffixes (utils.py:613)."""
    bcs = [ln.split("\t")[0].split("-")[0] for ln in _read_lines(path)]
    return np.asarray(bcs)


def load_slideseq(path: str) -> np.ndarray:
    """Slide-seq bead barcodes. 'BeadBarcodes' files are comma-separated
    base lists; 'matched' files carry a '-1' suffix. Uniqued like the
    reference (np.unique, utils.py:590,593)."""
    lines = _read_lines(path)
    if "BeadBarcodes" in path:
        bcs = ["".join(ln.split(",")) for ln in lines]
    else:
        bcs = [ln.split("\t")[0].split("-")[0] for ln in lines]
    return np.unique(np.asarray(bcs))


def load_h5(path: str, min_genes: int) -> np.ndarray:
    """Cell-called barcodes from a 10x h5 (scanpy min_genes filter replicated
    with h5py + a genes-per-cell count; reference utils.py:606-610)."""
    import h5py
    import scipy.sparse as sp

    with h5py.File(path, "r") as f:
        grp = f["matrix"] if "matrix" in f else f[list(f.keys())[0]]
        barcodes = [b.decode() if isinstance(b, bytes) else b for b in grp["barcodes"][:]]
        data = grp["data"][:]
        indices = grp["indices"][:]
        indptr = grp["indptr"][:]
        shape = grp["shape"][:]
    # 10x h5 is CSC with cells as columns: genes-per-cell = nnz per column
    mat = sp.csc_matrix((data, indices, indptr), shape=tuple(shape))
    genes_per_cell = (mat > 0).sum(axis=0).A1
    keep = genes_per_cell >= min_genes
    return np.asarray([b[:16] for b, k in zip(barcodes, keep) if k])


def load(path: str, min_genes: int = 20) -> np.ndarray:
    if ".h5" in path:
        return load_h5(path, min_genes)
    if "BeadBarcodes" in path or "matched" in path:
        return load_slideseq(path)
    return load_txt(path)


def data_driven(raw_counts: dict[str, int], master_path: str,
                min_count: int = 20) -> np.ndarray:
    """3p10XGEX whitelist: raw barcodes observed >min_count times intersected
    with the master list (utils.py:1439-1447). Order follows the observed-
    count Series index like the reference (pandas preserves insertion order)."""
    master = set(load_txt(master_path).tolist())
    return np.asarray([bc for bc, c in raw_counts.items()
                       if c > min_count and bc in master])


def padded_refs(bcs: np.ndarray, spec: BarcodeMatchSpec) -> tuple[np.ndarray, np.ndarray]:
    """Build the padded whitelist 'reads' as an encoded (N_bc, ref_len) int8
    matrix (the synthetic STAR genome of the reference, utils.py:604-622).

    Returns (codes, ref_len). slideseq entries embed the linker:
    N*15 + bc[:8] + linker + bc[8:] + N*24 (utils.py:595)."""
    n = len(bcs)
    bc_lens = {len(b) for b in bcs}
    if n and len(bc_lens) == 1:
        # columnar build: encode the equal-length barcodes in one shot and
        # paste into an N-filled matrix (the python string-concat path
        # cost ~3 s for the 737K list)
        bl = bc_lens.pop()
        bc_codes, _ = encode_batch(list(bcs), max_len=bl)
        if spec.slideseq_linker:
            from .encode import encode as _enc
            link = _enc(SLIDESEQ_LINKER)
            ref_len = spec.pad_left + bl + len(link) + spec.pad_right
            codes = np.full((n, ref_len), N, np.int8)
            codes[:, spec.pad_left:spec.pad_left + 8] = bc_codes[:, :8]
            codes[:, spec.pad_left + 8:spec.pad_left + 8 + len(link)] = link
            codes[:, spec.pad_left + 8 + len(link):
                  spec.pad_left + bl + len(link)] = bc_codes[:, 8:]
        else:
            ref_len = spec.pad_left + bl + spec.pad_right
            codes = np.full((n, ref_len), N, np.int8)
            codes[:, spec.pad_left:spec.pad_left + bl] = bc_codes
        return codes, np.int32(ref_len)
    if spec.slideseq_linker:
        seqs = ["N" * spec.pad_left + b[:8] + SLIDESEQ_LINKER + b[8:] + "N" * spec.pad_right
                for b in bcs]
    else:
        seqs = ["N" * spec.pad_left + b + "N" * spec.pad_right for b in bcs]
    ref_len = max((len(s) for s in seqs), default=0)
    codes, _ = encode_batch(seqs, max_len=ref_len)
    return codes, np.int32(ref_len)
