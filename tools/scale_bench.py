"""Transcriptome-scale proof run (VERDICT r2 missing #2 / next-step #3).

The reference's flagship whole-transcriptome modes run GENCODE-scale
references through minimap2 with the 3M whitelist
(/root/reference/scripts/align_genome.sh:9, README.md:98-116). This
harness synthesizes that regime — a multi-hundred-Mb transcriptome and a
>=1M-barcode product-structured whitelist — plus reads with known truth,
runs the full 5p10XGEX pipeline (fused path: decon → 1M-whitelist match →
dedup), and reports index-build time, throughput, peak RSS, and barcode
assignment accuracy vs truth.

Usage (real TPU):
  python tools/scale_bench.py [--mb 160] [--n-wl 1000000] [--reads 20000]
Writes the result line to stdout and docs/SCALE_RUN.json.
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import resource
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASES = np.frombuffer(b"ACGT", np.uint8)


def gen_transcriptome(path: str, total_mb: int, n_refs: int, rng):
    per = (total_mb * 1_000_000) // n_refs
    with open(path, "w") as f:
        for i in range(n_refs):
            seq = BASES[rng.integers(0, 4, per)].tobytes().decode()
            f.write(f">tx{i}\n")
            for j in range(0, len(seq), 120):
                f.write(seq[j:j + 120] + "\n")
    return per


def gen_whitelist(path: str, n: int, rng):
    """Product-structured list (like 10x's 737K/3M): n1 x n2 distinct
    halves — exercises ops/product_screen at scale."""
    n1 = int(np.ceil(np.sqrt(n)))
    n2 = -(-n // n1)
    h1 = set()
    while len(h1) < n1:
        h1.add(BASES[rng.integers(0, 4, 8)].tobytes().decode())
    h2 = set()
    while len(h2) < n2:
        h2.add(BASES[rng.integers(0, 4, 8)].tobytes().decode())
    h1, h2 = sorted(h1), sorted(h2)
    bcs = [a + b for a in h1 for b in h2][:n]
    with gzip.open(path, "wt", compresslevel=1) as f:
        f.write("\n".join(bcs) + "\n")
    return np.asarray(bcs)


def noisy(seq: str, rng, err=0.05):
    out = []
    for ch in seq:
        r = rng.random()
        if r < err * 0.35:
            continue                                   # deletion
        if r < err * 0.7:
            out.append("ACGT"[rng.integers(0, 4)])     # substitution
            continue
        out.append(ch)
        if r < err:
            out.append("ACGT"[rng.integers(0, 4)])     # insertion
    return "".join(out)


def gen_reads(path: str, tx_path: str, bcs, n_reads: int, rng):
    from nanoranger_tpu.io import fasta
    names, seqs = fasta.read_fasta_encoded(tx_path)
    truth = []
    with gzip.open(path, "wt", compresslevel=1) as f:
        for i in range(n_reads):
            tx = rng.integers(0, len(seqs))
            L = int(rng.integers(600, 2000))
            lo = int(rng.integers(0, max(1, len(seqs[tx]) - L)))
            body = BASES[np.asarray(seqs[tx][lo:lo + L]) % 4] \
                .tobytes().decode()
            bc = bcs[rng.integers(0, len(bcs))]
            umi = BASES[rng.integers(0, 4, 10)].tobytes().decode()
            read = noisy("CGCTCTTCCGATCT" + bc + umi + "TTTCTTATATG"
                         + body, rng)
            truth.append(bc)
            f.write(f"@sr{i}\n{read}\n+\n{'I' * len(read)}\n")
    return truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=160)
    ap.add_argument("--n-refs", type=int, default=4000)
    ap.add_argument("--n-wl", type=int, default=1_000_000)
    ap.add_argument("--reads", type=int, default=20_000)
    ap.add_argument("--keep", action="store_true")
    a = ap.parse_args()
    rng = np.random.default_rng(11)
    d = tempfile.mkdtemp(prefix="nr_scale_")
    print(f"[scale] workdir {d}", flush=True)

    t0 = time.time()
    gen_transcriptome(f"{d}/txome.fa", a.mb, a.n_refs, rng)
    bcs = gen_whitelist(f"{d}/wl.txt.gz", a.n_wl, rng)
    truth = gen_reads(f"{d}/reads.fastq.gz", f"{d}/txome.fa", bcs,
                      a.reads, rng)
    t_gen = time.time() - t0
    print(f"[scale] synthesized {a.mb} Mb / {len(bcs)} barcodes / "
          f"{a.reads} reads in {t_gen:.0f}s", flush=True)

    from nanoranger_tpu.align.index import PanelIndex
    t0 = time.time()
    index = PanelIndex.from_fasta(f"{d}/txome.fa")
    t_index = time.time() - t0
    n_anchors = len(index.hashes)
    print(f"[scale] index: {n_anchors/1e6:.1f}M minimizers in "
          f"{t_index:.0f}s", flush=True)

    from nanoranger_tpu.pipeline import run_pipeline
    t0 = time.time()
    run_pipeline("5p10XGEX", f"{d}/reads.fastq.gz", f"{d}/out", "sc",
                 trns_ref=f"{d}/txome.fa", genome_ref="/nonexistent",
                 barcodes=f"{d}/wl.txt.gz", batch_size=512)
    wall = time.time() - t0
    rs = json.load(open(f"{d}/out/sc_runstats.json"))

    # truth accuracy over accepted assignments
    import pandas as pd
    df = pd.read_csv(f"{d}/out/sc_assignments.csv.gz",
                     keep_default_na=False)
    acc_rows = df[df.status == 0]
    idx_of = {f"sr{i}": t for i, t in enumerate(truth)}
    n_ok = sum(1 for nm, bc in zip(acc_rows.name, acc_rows.bc)
               if idx_of.get(nm.split("_")[0]) == bc)
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    out = {
        "transcriptome_mb": a.mb, "n_refs": a.n_refs,
        "n_minimizers": int(n_anchors), "index_build_s": round(t_index, 1),
        "whitelist": int(len(bcs)), "reads": a.reads,
        "wall_s": round(wall, 1),
        "reads_per_s": round(a.reads / wall, 1),
        "steady_reads_per_s": rs["stages"][0].get("steady_reads_per_s"),
        "accepted": int(len(acc_rows)),
        "accept_rate": round(len(acc_rows) / max(len(df), 1), 3),
        "bc_accuracy_of_accepted": round(n_ok / max(len(acc_rows), 1), 4),
        "peak_rss_gb": round(peak_rss_gb, 2),
        "stages": rs["stages"],
    }
    print("[scale] " + json.dumps(out), flush=True)
    with open(os.path.join(REPO, "docs", "SCALE_RUN.json"), "w") as f:
        json.dump(out, f, indent=1)
    if not a.keep:
        import shutil
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
