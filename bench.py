"""Headline benchmark: reads/s through the streamed CLI's fused step.

Workload: real ONT reads (K562/Kasumi1 fusion sample bundled under
data/samples/) through the full single-chip 5p10XGEX CLI — minimizer
seed → chain DP → exact record extraction → end extension → flank
adapter scan → BC-UMI slice → full 737K-whitelist match (exact tiers +
exhaustive DP tail, stages/barcode) → artifacts — via run_pipeline, the
same code path users run (round-4 VERDICT #10: the bench must measure
the product, not a bench-only step).  The headline value is the CLI's
steady-state reads/s (per-batch fused-step throughput after one-time
program loads); whole-wall numbers ride along in `detail`.

Before the timed run, tools/prewarm.py compiles-and-persists every
executable the CLI needs (all length buckets + the match program), so
the measurement reflects the production warm state — a real deployment
compiles once per kernel revision, then every run/host/process loads in
seconds (runtime/aot_cache.py).

Baseline: the reference is a 16-core CPU toolchain (minimap2 | python
decon | STAR barcode matching; SLURM envelopes in BASELINE.md — no
published reads/s exists). We approximate its throughput by timing THIS
engine's computation on this host's CPU and scaling to 16 cores
(generous to the reference: its python decon loop is slower per core than
our vectorized CPU path). The CPU measurement is cached in
BENCH_BASELINE.json so TPU bench runs stay fast.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
SAMPLE = os.path.join(REPO, "data/samples/K562_Kasumi1_BCRABL1_RUNX1_RUNX1T1.fastq.gz")
PANEL = os.path.join(REPO, "data/RUNX1_RUNX1T1_ABL1_BCR.fa")
WHITELIST = os.path.join(REPO, "data/737K-august-2016.txt.gz")
BASELINE_FILE = os.path.join(REPO, "BENCH_BASELINE.json")

B = 1024          # reads per step
L = 2048          # padded read length
CPU_SCALE = 8.0   # this host has 2 cores; reference envelope is 16 cores


def _setup():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from nanoranger_tpu import chemistry
    from nanoranger_tpu.align.index import PanelIndex
    from nanoranger_tpu.io import fastq, whitelist
    from nanoranger_tpu.stages.barcode import BarcodeMatcher
    from nanoranger_tpu.stages.device_step import build_device_step

    spec = chemistry.get("5p10XGEX")
    batch = fastq.read_all(SAMPLE, max_len=L, pad_to_multiple=L)
    n = (len(batch) // B) * B
    codes = batch.codes[:n]
    lengths = batch.lengths[:n]
    index = PanelIndex.from_fasta(PANEL)
    bcs = whitelist.load_txt(WHITELIST)
    matcher = BarcodeMatcher(bcs, spec.barcode)
    step = build_device_step(spec, index, matcher, S=2, max_minimizers=512)
    return step, codes, lengths, n


def _measure(step, codes, lengths, n, iters):
    import jax
    out = None
    for s in range(0, n, B):                      # warmup + compile
        out = step(codes[s:s + B], lengths[s:s + B])
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        for s in range(0, n, B):
            out = step(codes[s:s + B], lengths[s:s + B])
    jax.block_until_ready(out)
    dt = time.time() - t0
    return n * iters / dt, out


def _cli_bench(n_reads=None):
    """Streamed-CLI throughput: tile the K562 sample to n_reads, run the
    full 5p10XGEX pipeline (align→decon→737K match→dedup) end-to-end via
    run_pipeline, report reads/s from the runstats telemetry. Default 20k
    keeps the driver's bench pass bounded on the tunneled single chip;
    set NANORANGER_CLI_BENCH_READS=100000 for the full-scale number."""
    n_reads = n_reads or int(os.environ.get("NANORANGER_CLI_BENCH_READS",
                                            20_000))
    import gzip
    import shutil
    import tempfile

    from nanoranger_tpu.pipeline import run_pipeline
    with gzip.open(SAMPLE, "rt") as f:
        lines = f.read().splitlines(keepends=True)
    n_src = len(lines) // 4
    reps = -(-n_reads // n_src)
    d = tempfile.mkdtemp(prefix="nr_bench_cli_")
    try:
        infile = os.path.join(d, "in.fastq.gz")
        with gzip.open(infile, "wt", compresslevel=1) as g:
            for t in range(reps):
                for i in range(0, len(lines), 4):
                    g.write(f"@t{t}_{lines[i][1:]}")
                    g.writelines(lines[i + 1:i + 4])
        t0 = time.time()
        run_pipeline("5p10XGEX", infile, d, "b", trns_ref=PANEL,
                     genome_ref="/nonexistent", barcodes=WHITELIST,
                     batch_size=2048)
        wall = time.time() - t0
        with open(os.path.join(d, "b_runstats.json")) as f:
            rs = json.load(f)
        total_reads = reps * n_src
        steady = rs["stages"][0].get("steady_reads_per_s")
        return {
            "cli_total_reads": total_reads,
            "cli_wall_s": round(wall, 1),
            "cli_reads_per_s": round(total_reads / wall, 1),
            # throughput after the first batch (one-time compiles /
            # cache loads / tracing excluded) — the production-scale
            # number: a real run is millions of reads behind the same
            # one-time cost
            "cli_steady_reads_per_s": steady,
            "cli_stages": rs["stages"],
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


def main():
    # cached CPU baseline (measured once, separate process to force CPU)
    if not os.path.isfile(BASELINE_FILE):
        r = subprocess.run(
            [sys.executable, __file__, "--cpu-baseline"],
            env={**os.environ, "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"},
            capture_output=True, text=True)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if line:
            with open(BASELINE_FILE, "w") as f:
                f.write(line[-1])
    baseline = None
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("cpu_16core_reads_per_s")

    # untimed: compile-and-persist every executable the CLI needs (warm
    # production state; a deployment compiles once per kernel revision)
    t0 = time.time()
    sys.path.insert(0, REPO)
    from tools.prewarm import prewarm
    try:
        prewarm(batch_size=2048, trns=PANEL, barcodes=WHITELIST,
                log=lambda *a: print("[prewarm]", *a, file=sys.stderr))
    except Exception as e:
        print(f"[prewarm] failed ({e!r}); CLI run compiles inline",
              file=sys.stderr)
    prewarm_s = round(time.time() - t0, 1)

    try:
        cli = _cli_bench()
    except Exception as e:
        cli = {"cli_error": repr(e)}
    steady = cli.get("cli_steady_reads_per_s") or cli.get("cli_reads_per_s")
    vs = round(steady / baseline, 2) if (baseline and steady) else None
    print(json.dumps({
        "metric": "5p10XGEX streamed-CLI fused-step steady reads/s/chip "
                  "(K562 sample, full 737K whitelist, exact STAR-parity "
                  "matcher) vs PROXY baseline (this engine's CPU path "
                  "scaled 2->16 cores; reference publishes no reads/s)",
        "value": steady,
        "unit": "reads/s",
        "vs_baseline": vs,
        "detail": {"prewarm_s": prewarm_s,
                   "baseline_kind": "proxy_engine_cpu16",
                   "baseline_cpu16_reads_per_s": baseline,
                   "reference_published_reads_per_s": None,
                   "reference_envelopes": "BASELINE.md (SLURM walltime/core "
                   "bounds only; no read counts → no derivable reads/s)",
                   **cli},
    }))


def cpu_baseline():
    step, codes, lengths, n = _setup()
    n = min(n, B)  # one batch is enough on 2 CPU cores
    reads_per_s, _ = _measure(step, codes, lengths, n, iters=1)
    print(json.dumps({
        "cpu_2core_reads_per_s": round(reads_per_s, 1),
        "cpu_16core_reads_per_s": round(reads_per_s * CPU_SCALE, 1),
        "note": "engine's own CPU path scaled x8 (2->16 cores) as a proxy "
                "for the reference 16-core toolchain (BASELINE.md)",
    }))


if __name__ == "__main__":
    if "--cpu-baseline" in sys.argv:
        cpu_baseline()
    else:
        main()
