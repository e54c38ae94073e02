"""Per-phase breakdown of the fused CLI hot loop (steady state).

Measures, on the current JAX default device, per 2048-read batch:
  step_s      — fused device program wall (block_until_ready)
  get_s       — device→host download of the step outputs
  asm_s       — host artifact assembly (assemble_batch)
  io_s        — gzip artifact writes
plus A/B of the two fused-step regressions suspects:
  - tables as ARGUMENTS vs closure constants (cc7b72a)
  - padded length L=2048 vs 4096, S=2 vs 4

Usage: python tools/profile_cli.py [--reads 8192] [--batch 2048]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLE = os.path.join(REPO,
                      "data/samples/K562_Kasumi1_BCRABL1_RUNX1_RUNX1T1.fastq.gz")
PANEL = os.path.join(REPO, "data/RUNX1_RUNX1T1_ABL1_BCR.fa")
WHITELIST = os.path.join(REPO, "data/737K-august-2016.txt.gz")


def tiled_sample(n_reads, d):
    """Tile the sample to n_reads, streaming record-by-record (holding
    the whole tiled file in RAM at large --reads would OOM the host)."""
    infile = os.path.join(d, "in.fastq.gz")
    written = 0
    with gzip.open(infile, "wt", compresslevel=1) as g:
        t = 0
        while written < n_reads:
            with gzip.open(SAMPLE, "rt") as f:
                rec = []
                for line in f:
                    rec.append(line)
                    if len(rec) == 4:
                        g.write(f"@t{t}_{rec[0][1:]}")
                        g.writelines(rec[1:])
                        written += 1
                        rec = []
                        if written >= n_reads:
                            break
            t += 1
    return infile, written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--max-len", type=int, default=4096)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from nanoranger_tpu import chemistry
    from nanoranger_tpu.align.index import PanelIndex
    from nanoranger_tpu.io import fastq, whitelist
    from nanoranger_tpu.io.encode import PAD
    from nanoranger_tpu.io.fasta import FastaWriter
    from nanoranger_tpu.stages.barcode import BarcodeMatcher
    from nanoranger_tpu.stages.cli_step import assemble_batch, build_cli_step

    spec = chemistry.get("5p10XGEX")
    index = PanelIndex.from_fasta(PANEL)
    bcs = whitelist.load_txt(WHITELIST)
    matcher = BarcodeMatcher(bcs, spec.barcode)
    step, tables = build_cli_step(spec, index, matcher=matcher)

    d = tempfile.mkdtemp(prefix="nr_prof_")
    infile, total = tiled_sample(args.reads, d)

    B, L = args.batch, args.max_len
    batches = []
    for batch in fastq.iter_batches(infile, B, max_len=L):
        n_real = len(batch)
        if n_real < B or batch.codes.shape[1] < L:
            codes = np.full((B, L), PAD, np.int8)
            codes[:n_real, :batch.codes.shape[1]] = batch.codes
            lengths = np.zeros(B, np.int32)
            lengths[:n_real] = batch.lengths
            batch = fastq.ReadBatch(codes, lengths,
                                    batch.names + [""] * (B - n_real),
                                    batch.quals + [b""] * (B - n_real))
        batches.append(batch)

    # warm compile
    out = step(batches[0].codes, batches[0].lengths, tables)
    jax.block_until_ready(out)

    res = {"n_batches": len(batches), "B": B, "L": L}
    # phase 1: device step only
    t0 = time.time()
    outs = []
    for b in batches:
        o = step(b.codes, b.lengths, tables)
        jax.block_until_ready(o)
        outs.append(o)
    res["step_s_per_batch"] = round((time.time() - t0) / len(batches), 3)

    # phase 1b: device step, async dispatch (pipelined)
    t0 = time.time()
    o2 = [step(b.codes, b.lengths, tables) for b in batches]
    jax.block_until_ready(o2)
    res["step_async_s_per_batch"] = round((time.time() - t0) / len(batches), 3)

    # phase 2: download
    t0 = time.time()
    host_outs = [jax.device_get(o) for o in outs]
    res["get_s_per_batch"] = round((time.time() - t0) / len(batches), 3)

    # phase 3: host assembly
    t0 = time.time()
    asms = []
    for b, o in zip(batches, host_outs):
        asms.append(assemble_batch(spec, o, b.codes, b.lengths, b.names,
                                   b.quals, index.names, "p",
                                   slow_fallback=lambda di: {}))
    res["asm_s_per_batch"] = round((time.time() - t0) / len(batches), 3)

    # phase 4: artifact IO
    t0 = time.time()
    fsub = fastq.FastqWriter(os.path.join(d, "p_deconcat.fastq.gz"))
    fbc = FastaWriter(os.path.join(d, "p_BCUMI.fasta.gz"))
    for a in asms:
        for nm, sq, ql in zip(a.sub_names, a.sub_seqs, a.sub_quals):
            fsub.write(nm, sq, ql)
        for nm, sq in zip(a.bcumi_names, a.bcumi_seqs):
            fbc.write(nm, sq)
    fsub.close()
    fbc.close()
    res["io_s_per_batch"] = round((time.time() - t0) / len(batches), 3)

    # A/B: closure-constant tables (pre-cc7b72a style)
    @jax.jit
    def step_cc(codes, lengths):
        return step.__wrapped__(codes, lengths, tables)

    o = step_cc(batches[0].codes, batches[0].lengths)
    jax.block_until_ready(o)
    t0 = time.time()
    for b in batches:
        o = step_cc(b.codes, b.lengths)
        jax.block_until_ready(o)
    res["step_closure_s_per_batch"] = round(
        (time.time() - t0) / len(batches), 3)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
