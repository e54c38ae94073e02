"""Sub-program timing of the fused step on the current JAX device.

Times each stage of the fused pipeline in isolation on real K562 reads
(B=1024, L=2048) so optimization effort lands where the time is
(VERDICT r3 next-step #4/#9):

  sketch       — minimizer sketching only
  seed_chain   — sketch + anchor lookup + (seg,t,q) sort + chain DP
  records_ext  — + exact record slots + base-level extension
  flank        — + adapter flank scan (full decon device path)
  fwd_match    — forward product-screen + banded rescore on candidates
  rc_match     — reverse-strand screen + best-score rescore
  full_step    — the complete fused CLI step

Usage: python tools/profile_step.py [--iters 20]
Prints one JSON line with seconds/batch per stage and reads/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SAMPLE = os.path.join(REPO,
                      "data/samples/K562_Kasumi1_BCRABL1_RUNX1_RUNX1T1.fastq.gz")
PANEL = os.path.join(REPO, "data/RUNX1_RUNX1T1_ABL1_BCR.fa")
WHITELIST = os.path.join(REPO, "data/737K-august-2016.txt.gz")
B, L = 1024, 2048


def bench_fn(fn, args, iters):
    import jax
    o = fn(*args)
    jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from nanoranger_tpu import chemistry
    from nanoranger_tpu.align.aligner import (prepare_index_arrays,
                                              seed_and_chain)
    from nanoranger_tpu.align.index import PanelIndex
    from nanoranger_tpu.align.minimizers import sketch_batch
    from nanoranger_tpu.io import fastq, whitelist
    from nanoranger_tpu.stages.barcode import BarcodeMatcher
    from nanoranger_tpu.stages.cli_step import build_cli_step

    spec = chemistry.get("5p10XGEX")
    index = PanelIndex.from_fasta(PANEL)
    bcs = whitelist.load_txt(WHITELIST)
    matcher = BarcodeMatcher(bcs, spec.barcode)

    batch = fastq.read_all(SAMPLE, max_len=L, pad_to_multiple=L)
    codes = jnp.asarray(batch.codes[:B])
    lengths = jnp.asarray(batch.lengths[:B])
    m = max(64, ((L // 4) + 63) // 64 * 64)
    ps, pc, planes = prepare_index_arrays(index)

    res = {"B": B, "L": L, "iters": args.iters,
           "backend": jax.default_backend()}

    sk = jax.jit(lambda c, l: sketch_batch(c, l, m))
    res["sketch_s"] = round(bench_fn(sk, (codes, lengths), args.iters), 4)

    sc = jax.jit(lambda c, l: seed_and_chain(c, l, ps, pc, planes,
                                             max_minimizers=m))
    res["seed_chain_s"] = round(bench_fn(sc, (codes, lengths),
                                         args.iters), 4)

    # full fused step (with + without matcher)
    step_nm, tables_nm = build_cli_step(spec, index, matcher=None)
    res["decon_only_step_s"] = round(
        bench_fn(step_nm, (codes, lengths, tables_nm), args.iters), 4)

    step, tables = build_cli_step(spec, index, matcher=matcher)
    res["full_step_s"] = round(bench_fn(step, (codes, lengths, tables),
                                        args.iters), 4)

    # matcher components on realistic candidates (86nt BCUMI windows)
    from nanoranger_tpu.io.encode import encode_batch
    from nanoranger_tpu.io.fasta import iter_fasta
    import gzip as _g
    cands = []
    # derive candidates by running the decon step once on host
    out = jax.device_get(step_nm(codes, lengths, tables_nm))
    from nanoranger_tpu.stages.cli_step import assemble_batch
    asm = assemble_batch(spec, out, np.asarray(codes),
                         np.asarray(lengths), batch.names[:B],
                         batch.quals[:B], index.names, "p",
                         slow_fallback=lambda di: {})
    cands = asm.bcumi_seqs[:B] or ["A" * 50]
    while len(cands) < B:
        cands.append(cands[len(cands) % max(1, len(cands) - 1)])
    q, qlen = encode_batch(cands, max_len=96)
    qd, qld = jnp.asarray(q), jnp.asarray(qlen)
    t = matcher.device_tables()

    full = jax.jit(lambda a, b: matcher.match_device_with(a, b, t))
    res["match_s"] = round(bench_fn(full, (qd, qld), args.iters), 4)
    # DP-tail pressure: how many candidates lack an exact/1-ins structure
    # on either strand (each flagged row pays the one-vs-all kernel)
    r = matcher.match(q, qlen)
    import numpy as _np
    res["n_dp_flagged"] = int(_np.sum((r["score"] < 15) &
                                      (qlen > 0)))

    res["full_step_reads_per_s"] = round(B / res["full_step_s"], 1)
    res["n_candidates_in_batch"] = len(asm.bcumi_seqs)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
