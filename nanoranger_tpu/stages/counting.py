"""UMI dedup, per-barcode counting, score histograms, knee plots, and the
gene×cell count matrix.

Replaces the dict-accumulation halves of process_matching_*
(utils.py:685-827,830-979,1135-1280,1461-1521) and FINISHES
make_count_mtx_3p10XGEX, which the reference leaves truncated mid-body
(utils.py:1523-1548 references undefined names and never writes the
matrix — SURVEY.md §2 #19e).

All aggregation is columnar: UMIs are packed to base-5 int64 keys and
grouped with np.unique — no python dict loops.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pandas as pd

from ..io.encode import decode


def pack_umis(umi_codes: np.ndarray) -> np.ndarray:
    """(N, umi_len) int8 codes → int64 base-5 keys (N can handle len<=27)."""
    keys = np.zeros(umi_codes.shape[0], dtype=np.int64)
    for t in range(umi_codes.shape[1]):
        keys = keys * 5 + umi_codes[:, t].clip(0, 4)
    return keys


def umi_dedup_table(bc_strings: np.ndarray, umi_codes: np.ndarray) -> pd.DataFrame:
    """Per-barcode unique-UMI and read counts with dup_rate, sorted by
    umi_cnt descending (utils.py:759-777)."""
    if len(bc_strings) == 0:
        return pd.DataFrame(columns=["bc", "umi_cnt", "read_cnt", "dup_rate"]
                            ).set_index("bc")
    umis = pack_umis(umi_codes)
    df = pd.DataFrame({"bc": bc_strings, "umi": umis})
    g = df.groupby("bc", sort=False)["umi"]
    out = pd.DataFrame({"umi_cnt": g.nunique(), "read_cnt": g.size()})
    out = out.sort_values("umi_cnt", ascending=False)
    out["dup_rate"] = out["read_cnt"] / out["umi_cnt"]
    out.index.name = "bc"
    return out[out.umi_cnt > 0]


def barcode_scores_table(scores: np.ndarray) -> pd.DataFrame:
    """Score histogram sorted by count desc (reference sort_cnt of flag==0
    AS values, utils.py:726-730)."""
    v, c = np.unique(scores, return_counts=True)
    df = pd.DataFrame({"score": v, "count": c})
    return df.sort_values("count", ascending=False).reset_index(drop=True)


def save_knee_plot(path: str, counts: np.ndarray, ylabel: str):
    """log10 rank vs log10 count knee plot (utils.py:788-798)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    counts = np.sort(np.asarray(counts))[::-1]
    counts = counts[counts > 0]
    if len(counts) == 0:
        return
    plt.figure(figsize=(5, 5))
    plt.plot(np.log10(np.arange(1, len(counts) + 1)), np.log10(counts))
    plt.ylabel(ylabel)
    plt.xlabel("log10 cell rank")
    plt.title("library knee plot")
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def save_score_plot(path: str, scores_df: pd.DataFrame, min_score: int):
    """Barcode AS-score bar plot (utils.py:731-736)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    d = scores_df[scores_df["score"] > min_score]
    if len(d) == 0:
        return
    plt.figure(figsize=(5, 3))
    plt.bar(d["score"].astype(str), d["count"])
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def quads_dict(bc_strings, umi_codes, trans: list) -> dict:
    """3p10XGEX per-shard quads structure {bc: [[umi, trns], ...]}
    (utils.py:1504) — kept for artifact parity."""
    out: dict = {}
    for b, u, t in zip(bc_strings, umi_codes, trans):
        out.setdefault(b, []).append([decode(u), t])
    return out


def count_matrix(bc_strings: np.ndarray, umi_codes: np.ndarray,
                 trans: np.ndarray):
    """Gene×cell unique-UMI counts.

    Returns (genes (G,), cells (C,), counts (nnz, 3) [gene_i, cell_i, n]).
    This is the completion of make_count_mtx_3p10XGEX (counts = number of
    distinct UMIs per (gene, cell))."""
    if len(bc_strings) == 0:
        return (np.asarray([], dtype=object), np.asarray([], dtype=object),
                np.zeros((0, 3), np.int64))
    umis = pack_umis(umi_codes)
    df = pd.DataFrame({"bc": bc_strings, "umi": umis, "g": trans})
    dd = df.drop_duplicates()                     # unique (bc, umi, gene)
    piv = dd.groupby(["g", "bc"]).size().reset_index(name="n")
    genes, gi = np.unique(piv["g"].to_numpy(), return_inverse=True)
    cells, ci = np.unique(piv["bc"].to_numpy(), return_inverse=True)
    counts = np.stack([gi, ci, piv["n"].to_numpy()], axis=1).astype(np.int64)
    return genes, cells, counts


def write_mtx(prefix: str, genes, cells, counts):
    """MatrixMarket + tsv sidecars: {prefix}_gex.mtx.gz, _genes.tsv,
    _barcodes.tsv (the artifact the reference's truncated function was
    meant to emit, utils.py:1523-1548)."""
    os.makedirs(os.path.dirname(os.path.abspath(prefix)), exist_ok=True)
    with gzip.open(f"{prefix}_gex.mtx.gz", "wt") as f:
        f.write("%%MatrixMarket matrix coordinate integer general\n")
        f.write(f"{len(genes)} {len(cells)} {len(counts)}\n")
        for g, c, n in counts:
            f.write(f"{g + 1} {c + 1} {n}\n")
    with open(f"{prefix}_genes.tsv", "w") as f:
        f.writelines(f"{g}\n" for g in genes)
    with open(f"{prefix}_barcodes.tsv", "w") as f:
        f.writelines(f"{c}\n" for c in cells)


def trans_counts_table(trans: list) -> pd.DataFrame:
    """Transcript tag counts (reference _trns_ct.csv via sort_cnt,
    utils.py:826-827)."""
    v, c = np.unique(np.asarray(trans, dtype=object), return_counts=True)
    df = pd.DataFrame({0: v, 1: c.astype(int)})
    return df.sort_values(1, ascending=False).reset_index(drop=True)
