"""Pipeline CLI: mode orchestration over the device engine.

Flag-compatible with the reference (`pipeline.py:7-34`): --cores --trns_ref
--genome_ref --infile --outdir --expname --barcodes --split --mode
--xpecies (argparse prefix abbreviations --c/--i/--o/--e/--m/--t/--g/--b
work as in the reference README). `--split`/`--cores` are accepted but
ignored: sharding is replaced by streamed device batches (and, multi-chip,
by the jax.sharding mesh in parallel/), not by seqkit+Pool fan-out.

Artifacts keep the reference's names so downstream consumers can switch:
  {sample}_deconcat.fastq.gz / _VDJ.fastq.gz     subreads (MiXCR input)
  {sample}_BCUMI.fasta.gz                        barcode candidates
  {sample}_eds.csv / _eds_names.csv / _polyA.fasta.gz
  {sample}_barcode_scores.csv/.pdf, _knee*.pdf
  {sample}_bcumi_dedup.csv
  {sample}_genome_tagged.bam (CB/UB/XT tags)
  {sample}_bc_read_count.csv, _quads.json, _gex.mtx.gz (+sidecars)
  {sample}_clones_filtered.csv, _cloneID_filtered.csv.gz, _clone_bcumi.csv.gz

MiXCR stays an external boundary tool (SURVEY.md §2.2): when its exports
(_clones.txt.gz/_cloneID.txt.gz) are present in the outdir the clone joins
run; otherwise the pipeline emits MiXCR's input fastq and reports what to
run.
"""

from __future__ import annotations

import argparse
import gzip
import itertools
import json
import os
import sys
import time

import numpy as np
import pandas as pd

from . import chemistry
from .align.aligner import PanelAligner
from .align.index import PanelIndex
from .io import fastq, whitelist
from .io.bam import BAMWriter
from .io.encode import decode, encode_batch
from .io.fasta import FastaWriter
from .runtime.native_lib import banded_align_batch
from .stages import clones as clone_stage
from .stages import counting
from .stages.barcode import ACCEPT, BAD_UMI, LOW_AS, BarcodeMatcher
from .stages.decon import run_decon

DATA_DIR = os.environ.get(
    "NANORANGER_DATA",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "data"))

MODE_DEFAULTS = {  # (trns_ref, genome_ref, barcodes) — reference pipeline.py
    "5p10XGEX": ("panel_MT_trns.fa", "MT_chr.fa", "737K-august-2016.txt.gz"),
    "5p10XTCR": ("TR_V_human.fa", None, "737K-august-2016.txt.gz"),
    "RTX": ("TR_V_human.fa", None, None),
    "3pXCR_slideseq": ("XR_C_mouse.fa", None, "slideseq.matched.barcodes.tsv.gz"),
    "3p10XTCR": ("TRab_C_mouse.fa", None, "slideseq.matched.barcodes.tsv.gz"),
    "3p10XTCR_nuc": ("TR_V_human.fa", None, "3M-february-2018.txt.gz"),
    "3p10XGEX": ("panel_MT_trns.fa", None, "3M-february-2018.txt.gz"),
}


# standalone barcode-match program shape (match_barcodes + the AOT
# loader prewarm in DeconRun._run_fast must agree, or the cached
# executable misses)
MATCH_BATCH, MATCH_LQ = 4096, 96


def _inflight() -> int:
    """Fused-path device-queue depth (batches in flight beyond the one
    draining).  See dispatch() in DeconRun._run_fast."""
    return int(os.environ.get("NANORANGER_INFLIGHT", "3"))


def log(msg: str):
    print(f"[nanoranger-tpu] {msg}", flush=True)


class Telemetry:
    """Machine-readable per-stage run telemetry (SURVEY.md §5: 'real step
    timing + reads/s counters' — the reference only has print-every-N).
    Written atomically as {sample}_runstats.json at pipeline exit."""

    def __init__(self, mode: str, infile: str):
        self.t0 = time.time()
        self.doc = {"mode": mode, "infile": infile, "stages": []}

    def stage(self, name: str, seconds: float, reads: int | None = None,
              **extra):
        row = {"stage": name, "seconds": round(seconds, 3)}
        if reads is not None and reads >= 0:
            row["reads"] = int(reads)
            if seconds > 0:
                row["reads_per_s"] = round(reads / seconds, 1)
        row.update({k: v for k, v in extra.items()
                    if v is not None and not (isinstance(v, int) and v < 0)})
        self.doc["stages"].append(row)

    def write(self, outdir: str, sample: str):
        self.doc["total_seconds"] = round(time.time() - self.t0, 3)
        path = f"{outdir}/{sample}_runstats.json"
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.doc, f, indent=1)
        os.replace(tmp, path)


# ---------------------------------------------------------------------------

class DeconRun:
    """Streamed align+decon over an input fastq, accumulating BC-UMI
    candidates and writing subread/BCUMI artifacts.

    Default (single-device) execution is the FUSED fast path
    (stages/cli_step.py): one jitted program per batch covering
    seed→chain→record extraction→extension→flank scan→BC-UMI slice→
    whitelist match, byte-identical to the unfused path (reads with more
    kept chains than device slots are rerouted through it). Set
    NANORANGER_NO_FAST=1 to force the unfused path.

    data_shards > 1 runs the unfused device part data-parallel: batch i
    chains on device i%N while the host assembles earlier batches
    (deterministic in-order merge, so N-device artifacts are
    byte-identical to 1-device — SURVEY.md §7 layer 7; tested in
    tests/test_data_parallel.py).

    Resume: when the stage artifacts already exist (and force=False), the
    BC-UMI candidates are reloaded from _BCUMI.fasta.gz instead of
    recomputing — the reference's resume-on-existence idiom (SURVEY.md §5),
    made safe here by atomic artifact writes (io writers use tmp+rename,
    so an existing file is always complete)."""

    def __init__(self, spec, infile, outdir, sample, trns_ref,
                 batch_size=2048, max_len=4096, force=False,
                 data_shards=1, matcher=None, fast=None):
        self.spec = spec
        self.prematch = None
        self.n_deferred = 0
        t0 = time.time()
        sub_kind = "VDJ" if spec.name in (
            "3pXCR_slideseq", "3p10XTCR", "3p10XTCR_nuc") else "deconcat"
        self.sub_path = f"{outdir}/{sample}_{sub_kind}.fastq.gz"
        self.bcumi_path = f"{outdir}/{sample}_BCUMI.fasta.gz"
        # spill-backed candidate store: bounded resident memory however
        # many reads stream through (round-4 VERDICT weak #8 / #9)
        from .io.candidate_store import CandidateStore
        self.cands = CandidateStore()
        self.eds_rows: list = []
        self.raw_counts: dict = {}
        self.polyA: list = []
        self.resumed = False

        # resume requires the stats artifacts too: a crash between the
        # decon writers closing and write_eds() would otherwise leave the
        # eds/polyA stats permanently missing without --force
        need = [self.sub_path, self.bcumi_path] + \
            self.eds_artifacts(outdir, sample)
        rc_path = f"{outdir}/{sample}_bc_read_count.csv"
        if spec.name == "3p10XGEX":
            need.append(rc_path)
        if not force and all(os.path.isfile(p) for p in need):
            from .io.fasta import iter_fasta
            for nm, sq in iter_fasta(self.bcumi_path):
                self.cands.append(nm, sq)
            if spec.name == "3p10XGEX":
                rc = pd.read_csv(rc_path, index_col=0)
                self.raw_counts = dict(zip(rc.index, rc.iloc[:, 0]))
            self.resumed = True
            self.n_reads = self.n_sub = -1
            log(f"resume: decon artifacts present, loaded "
                f"{len(self.cands)} BC-UMI candidates "
                f"({time.time() - t0:.1f}s)")
            return

        self.index = PanelIndex.from_fasta(trns_ref)
        if fast is None:
            fast = (data_shards <= 1 and
                    os.environ.get("NANORANGER_NO_FAST", "") != "1")
        if fast:
            self._run_fast(spec, infile, outdir, sample, batch_size,
                           max_len, matcher, t0)
            return
        devs = None
        if data_shards > 1:
            import jax
            devs = jax.devices()[:data_shards]
            if len(devs) < data_shards:
                log(f"WARNING: {data_shards} data shards requested but only "
                    f"{len(devs)} devices present — using {len(devs)}")
        self.aligner = PanelAligner(self.index, devices=devs)
        from collections import deque

        from .align.aligner import extract_records
        from .ops.extend import extend_records_host
        n_reads = n_sub = 0
        fsub = fastq.FastqWriter(self.sub_path)
        fbc = FastaWriter(self.bcumi_path)
        pending: deque = deque()

        def drain():
            nonlocal n_reads, n_sub
            batch, ch = pending.popleft()
            rec = extract_records(ch, self.index, np.asarray(batch.lengths))
            # base-level DP extension of chain ends: qstart/qend match
            # minimap2's extended spans (read-name coords + subread slices,
            # reference utils.py:146-148), not terminal anchors
            extend_records_host(rec, self.index, batch.codes, batch.lengths)
            out = run_decon(spec, batch.codes, batch.lengths, batch.names,
                            batch.quals, rec, self.index.names, sample,
                            dev_codes=ch.get("dev_codes"))
            for nm, sq, ql in zip(out.sub_names, out.sub_seqs, out.sub_quals):
                fsub.write(nm, sq, ql)
            for nm, sq in zip(out.bcumi_names, out.bcumi_seqs):
                fbc.write(nm, sq)
                self.cands.append(nm, sq)
            self.eds_rows.extend(out.eds_rows)
            self.polyA.extend(out.polyA)
            for k, v in out.raw_bc_counts.items():
                self.raw_counts[k] = self.raw_counts.get(k, 0) + v
            n_reads += len(batch)
            n_sub += len(out.sub_names)

        inflight = len(devs) if devs else 1
        for i, batch in enumerate(
                fastq.iter_batches(infile, batch_size, max_len=max_len)):
            # dispatch the device work (async) before draining older
            # batches, so up to `inflight` chips chain concurrently
            ch = self.aligner._chain(batch.codes, batch.lengths, shard=i)
            pending.append((batch, ch))
            if len(pending) > inflight:
                drain()
        while pending:
            drain()
        fsub.close()
        fbc.close()
        self.n_reads = n_reads
        self.n_sub = n_sub
        log(f"align+decon: {n_reads} reads → {n_sub} subreads, "
            f"{len(self.cands)} BC-UMI candidates "
            f"({time.time() - t0:.1f}s)")

    def _run_fast(self, spec, infile, outdir, sample, batch_size, max_len,
                  matcher, t0):
        """Fused hot path: one device program per batch (stages/cli_step),
        host assembles artifacts from downloaded slot coordinates.

        Reads dispatch in LENGTH-BUCKETED fixed shapes (batch_size, Lb)
        for Lb in {1024, 2048, max_len}: ONT read medians are ~500 nt, so
        padding every batch to max_len makes seed+chain ~4x more expensive
        than the data requires, while exact per-batch shapes would
        recompile constantly (~10-25 s per compile request over a
        remote-compile tunnel). Each read carries its input ordinal; an
        order-restoring writer emits artifacts strictly in input order, so
        bucketing changes NOTHING about the artifact byte streams (tested
        in tests/test_cli_fast_path.py / test_real_samples.py)."""
        import jax

        from collections import deque

        from .io.encode import PAD
        from .stages.cli_step import assemble_batch, build_cli_step

        on_accel = jax.default_backend() != "cpu"
        # On CPU the matcher stays OUT of the fused program: its
        # exhaustive-DP tail routes through the native C++ kernel on the
        # host instead (stages/barcode._match_host) — in-jit it would be
        # the XLA scan at ~1.7 s/flagged candidate.  match_barcodes then
        # matches all candidates standalone (prematched=None).
        cli_matcher = matcher if on_accel else None
        step, tables = build_cli_step(spec, self.index, matcher=cli_matcher)
        self._fallback_aligner = None
        BUCKETS = sorted({max(256, min(1024, max_len)),
                          max(256, min(2048, max_len)), max(256, max_len)})
        BUCKETS_ARR = np.asarray(BUCKETS)
        if on_accel and os.environ.get("NANORANGER_AOT", "") != "0":
            # AOT executable cache: deterministic cold start (the jax
            # persistent cache keys are process-unstable for this program
            # — runtime/aot_cache.py). Tables are step ARGUMENTS, so the
            # executable is content-independent: any panel/whitelist with
            # the same table shapes reuses it. Default ON for
            # accelerators (VERDICT r3 #5); loads run under a watchdog
            # deadline with jit fallback because tunnel backends have
            # hung on multi-hundred-MB transfers (NANORANGER_AOT=0
            # disables). Executables load on a BACKGROUND daemon thread,
            # smallest bucket first, overlapping the ~5 s/program
            # transfer with fastq streaming + host work; dispatch()
            # blocks only on the bucket it actually needs. The standalone
            # match program loads last so the barcode stage is warm by
            # the time decon finishes.
            import threading

            from .runtime.aot_cache import get_or_compile
            _loaded: dict = {}
            _evts = {Lb: threading.Event() for Lb in BUCKETS}

            def _loader():
                for Lb in BUCKETS:                # ascending: hot first
                    example = (np.full((batch_size, Lb), PAD, np.int8),
                               np.zeros(batch_size, np.int32), tables)
                    _loaded[Lb] = get_or_compile(
                        f"cli_step_{spec.name}_L{Lb}", step, example,
                        (spec.name, Lb), log=log)
                    _evts[Lb].set()
                if matcher is not None and spec.barcode is not None:
                    matcher.enable_aot(MATCH_BATCH, MATCH_LQ, log=log)

            threading.Thread(target=_loader, daemon=True,
                             name="nr-aot-loader").start()

            def step_for(Lb):
                _evts[Lb].wait()
                return _loaded[Lb]
        else:
            def step_for(Lb):
                return step
        do_match = cli_matcher is not None and spec.barcode is not None
        umi_len = spec.barcode.umi_len if do_match else 0
        # per-phase wall accounting (surfaced in runstats as phase_s):
        # read = fastq stream+encode, step = device wall at device_get,
        # assemble = host artifact assembly, slow = unfused fallback runs
        ph = self.phase_s = {"read": 0.0, "step": 0.0, "assemble": 0.0,
                             "slow": 0.0}
        mbc, mscore, mstatus, mumi = [], [], [], []
        n_reads = n_sub = 0
        fsub = fastq.FastqWriter(self.sub_path)
        fbc = FastaWriter(self.bcumi_path)
        pending: deque = deque()
        # deferred-read windowing: batches whose reads all fit the fused
        # slots are written immediately; batches containing deferred reads
        # buffer until one windowed fallback run covers them (bounded at
        # FLUSH_BATCHES / DEFER_CAP so memory stays bounded and the
        # unfused fallback — with its own one-time compiles — runs once
        # per window instead of per batch)
        FLUSH_BATCHES, DEFER_CAP = 16, 448
        buffer: list = []
        buf_defers = 0

        # order-restoring emission: reads dispatch per length bucket (out
        # of input order); chunks[seq] holds one read's assembled
        # artifacts until the write cursor reaches it, so every artifact
        # stream stays byte-identical to in-order processing
        chunks: dict = {}
        cursor = 0

        def advance():
            nonlocal cursor, n_sub
            while cursor in chunks:
                asm, lo, hi = chunks.pop(cursor)
                for j in range(lo[0], hi[0]):
                    fsub.write(asm.sub_names[j], asm.sub_seqs[j],
                               asm.sub_quals[j])
                for j in range(lo[1], hi[1]):
                    fbc.write(asm.bcumi_names[j], asm.bcumi_seqs[j])
                    self.cands.append(asm.bcumi_names[j], asm.bcumi_seqs[j])
                    # gate on the SAME condition assemble_batch uses to
                    # populate match_* (matcher AND spec.barcode) — a
                    # matcher without a barcode spec must not IndexError
                    if do_match:
                        mbc.append(asm.match_bc[j])
                        mscore.append(asm.match_score[j])
                        mstatus.append(asm.match_status[j])
                        mumi.append(asm.match_umi[j])
                self.eds_rows.extend(asm.eds_rows[lo[2]:hi[2]])
                self.polyA.extend(asm.polyA[lo[3]:hi[3]])
                for key in asm.raw_keys[lo[4]:hi[4]]:
                    self.raw_counts[key] = self.raw_counts.get(key, 0) + 1
                n_sub += hi[0] - lo[0]
                cursor += 1

        def emit(asm, seqs):
            self.n_deferred += asm.n_deferred_reads
            prev = (0, 0, 0, 0, 0)
            for k, b in enumerate(asm.read_bounds):
                s = int(seqs[k])
                if s >= 0:
                    chunks[s] = (asm, prev, b)
                prev = b
            advance()

        def flush():
            nonlocal buf_defers
            if not buffer:
                return
            rows = []                       # (buffer slot, local read idx)
            for bi, (batch, _seqs, _n, out) in enumerate(buffer):
                for i in np.where(out["defer"])[0]:
                    rows.append((bi, int(i)))
            groups_all: dict = {}
            if rows:
                from .io.encode import PAD as _PAD
                n = len(rows)
                # fixed max_len width: deferred rows come from different
                # buckets, and the fallback programs must hit ONE
                # prewarmed shape
                cr = np.full((n, max_len), _PAD, np.int8)
                lr = np.zeros(n, np.int32)
                nr, qr = [], []
                for k, (bi, i) in enumerate(rows):
                    b = buffer[bi][0]
                    w = b.codes.shape[1]
                    cr[k, :w] = b.codes[i]
                    lr[k] = b.lengths[i]
                    nr.append(b.names[i])
                    qr.append(b.quals[i])
                tslow = time.time()
                # chunk to <=DEFER_CAP rows: one drained batch can add up
                # to batch_size deferred reads, and an unchunked call
                # would pad to a 1024+ row shape the prewarm never
                # compiled (~5 s program load mid-steady-state)
                g: dict = {}
                for base in range(0, n, DEFER_CAP):
                    e = min(base + DEFER_CAP, n)
                    gi = self._slow_groups(spec, sample, cr[base:e],
                                           lr[base:e], nr[base:e],
                                           qr[base:e])
                    for k, v in gi.items():
                        g[base + k] = v
                ph["slow"] += time.time() - tslow
                for k, (bi, i) in enumerate(rows):
                    groups_all[(bi, i)] = g.get(k, {})
            tasm = time.time()
            for bi, (batch, seqs, _n, out) in enumerate(buffer):
                asm = assemble_batch(
                    spec, out, batch.codes, batch.lengths, batch.names,
                    batch.quals, self.index.names, sample,
                    slow_fallback=lambda didx, bi=bi: {
                        int(i): groups_all.get((bi, int(i)), {})
                        for i in didx})
                emit(asm, seqs)
            ph["assemble"] += time.time() - tasm
            buffer.clear()
            buf_defers = 0

        self._t_steady0 = None
        self._reads_so_far = 0
        self._steady_rearm = False
        first_batch = [True]

        def drain():
            nonlocal n_reads, buf_defers
            batch, seqs, n_real, out_dev = pending.popleft()
            tget = time.time()
            out = jax.device_get(out_dev)
            ph["step"] += time.time() - tget
            n_reads += n_real
            self._reads_so_far = n_reads
            nd = int(out["defer"].sum())
            buffer.append((batch, seqs, n_real, out))
            buf_defers += nd
            if first_batch[0] and on_accel:
                # prewarm the unfused fallback programs UNCONDITIONALLY on
                # the first batch (the programs are shape-specialized to
                # pinned buckets, not the data), so their one-time
                # compiles land before the steady-state marker.
                # Tolerant: on very large indexes the unfused chain can
                # exhaust HBM next to the fused executables + tables
                # (observed on the 160 Mb scale run) — a failed prewarm
                # just leaves the fallback cold, and workloads that never
                # defer (single-subread reads) never touch it.
                didx = np.where(out["defer"])[0][:8]
                if len(didx) == 0:
                    didx = np.zeros(1, np.int64)
                cr = np.full((len(didx), max_len), PAD, np.int8)
                cr[:, :batch.codes.shape[1]] = batch.codes[didx]
                try:
                    self._slow_groups(spec, sample, cr,
                                      np.asarray(batch.lengths)[didx],
                                      [batch.names[j] for j in didx],
                                      [batch.quals[j] for j in didx])
                except Exception as e:      # pragma: no cover - HW-dependent
                    log(f"WARNING: unfused-fallback prewarm failed "
                        f"({type(e).__name__}); fallback stays cold")
                    self._fallback_aligner = None
            if buf_defers == 0 or len(buffer) >= FLUSH_BATCHES or \
                    buf_defers >= DEFER_CAP:
                flush()
            first_batch[0] = False
            if self._t_steady0 is None or self._steady_rearm:
                # (re)arm the steady marker: one-time costs (step
                # compile/AOT load, fallback compiles) for every bucket
                # dispatched SO FAR have now been paid. dispatch() rearms
                # whenever a NEW length bucket first blocks on its
                # program load, so late-bucket compiles can never land
                # inside the steady window (round-4 VERDICT weak #3: a
                # cold cache recorded 120.5 "steady" reads/s because
                # L2048/L4096 compiled mid-run after the marker was set).
                self._t_steady0 = time.time()
                self._reads_at_steady0 = n_reads
                self._steady_rearm = False

        def _new_acc(Lb):
            return {"codes": np.full((batch_size, Lb), PAD, np.int8),
                    "lengths": np.zeros(batch_size, np.int32),
                    "names": [""] * batch_size,
                    "quals": [b""] * batch_size,
                    "seq": np.full(batch_size, -1, np.int64), "n": 0}

        acc = {Lb: _new_acc(Lb) for Lb in BUCKETS}

        buckets_seen: set = set()

        def dispatch(Lb):
            a = acc[Lb]
            if a["n"] == 0:
                return
            if Lb not in buckets_seen:
                buckets_seen.add(Lb)
                self._steady_rearm = True   # this bucket's program load /
                                            # compile is a one-time cost
            out_dev = step_for(Lb)(a["codes"], a["lengths"], tables)
            pending.append((fastq.ReadBatch(a["codes"], a["lengths"],
                                            a["names"], a["quals"]),
                            a["seq"], a["n"], out_dev))
            acc[Lb] = _new_acc(Lb)
            # keep up to 1+NANORANGER_INFLIGHT batches in flight: the
            # device computes ahead while the host drains (download +
            # assembly + artifact IO).  Scale-regime runs (100 Mb+
            # indexes, 1M+ whitelists) lower this so concurrent batch
            # activations don't stack on top of the resident tables in
            # HBM (observed RESOURCE_EXHAUSTED at depth 4 on the 160 Mb
            # scale run).
            if len(pending) > _inflight():
                drain()

        if on_accel and os.environ.get("NANORANGER_AOT", "") == "0":
            # no AOT loader: prewarm every bucket shape before the stream
            # so no compile stall lands mid-run. (With the background
            # loader, dispatch() blocks per bucket as needed — a
            # synchronous prewarm here would serialize the loads and
            # forfeit the streaming overlap.)
            for Lb in BUCKETS:
                d = step_for(Lb)(np.full((batch_size, Lb), PAD, np.int8),
                                 np.zeros(batch_size, np.int32), tables)
            jax.block_until_ready(d)

        it = fastq.iter_batches(infile, batch_size, max_len=max_len)
        in_batches = next_seq = 0
        while True:
            tread = time.time()
            batch = next(it, None)
            ph["read"] += time.time() - tread
            if batch is None:
                break
            w = batch.codes.shape[1]
            bl = np.minimum(np.asarray(batch.lengths), max_len)
            # vectorized bucket routing: one sliced copy per
            # (bucket, contiguous run) instead of a per-read Python loop
            bidx = np.searchsorted(BUCKETS_ARR, bl)
            for b, Lb in enumerate(BUCKETS):
                rows = np.nonzero(bidx == b)[0]
                r0 = 0
                while r0 < len(rows):
                    a = acc[Lb]
                    k = a["n"]
                    take = min(batch_size - k, len(rows) - r0)
                    sel = rows[r0:r0 + take]
                    w2 = min(w, Lb)
                    a["codes"][k:k + take, :w2] = batch.codes[sel, :w2]
                    a["lengths"][k:k + take] = bl[sel]
                    for j, i in enumerate(sel):
                        a["names"][k + j] = batch.names[i]
                        a["quals"][k + j] = batch.quals[i]
                    a["seq"][k:k + take] = next_seq + sel
                    a["n"] = k + take
                    r0 += take
                    if a["n"] == batch_size:
                        dispatch(Lb)
            next_seq += len(batch)
            in_batches += 1
            if in_batches % FLUSH_BATCHES == 0:
                # anti-starvation: a rare bucket (long reads are ~1% of
                # ONT libraries) would otherwise stall the write cursor —
                # and the reorder buffer — until its batch finally fills
                for Lb in BUCKETS:
                    dispatch(Lb)
        for Lb in BUCKETS:
            dispatch(Lb)
        while pending:
            drain()
        flush()
        advance()
        if chunks:       # every dispatched read must have been emitted
            raise RuntimeError(
                f"order-restoring writer stalled at read {cursor} with "
                f"{len(chunks)} assembled reads pending")
        fsub.close()
        fbc.close()
        if cli_matcher is not None:
            from .stages.barcode import DP_PENDING
            n = len(mbc)
            umi = np.full((n, umi_len), PAD, np.int8)
            pend = np.zeros(n, bool)
            for i, u in enumerate(mumi):
                if u is None:
                    pend[i] = True              # deferred read — match later
                else:
                    umi[i] = u
            status_arr = np.asarray(mstatus, np.int32)
            # rows the in-stream tier passes could not resolve (fused
            # step runs dp=False): matched post-hoc with everything else
            pend |= status_arr == DP_PENDING
            self.prematch = {
                "bc_idx": np.asarray(mbc, np.int32),
                "score": np.asarray(mscore, np.int32),
                "status": status_arr,
                "umi": umi, "pending": pend}
        self.n_reads = n_reads
        self.n_sub = n_sub
        self.steady_reads_per_s = None
        if getattr(self, "_t_steady0", None) and \
                n_reads > self._reads_at_steady0:
            dt = time.time() - self._t_steady0
            if dt > 0:
                self.steady_reads_per_s = round(
                    (n_reads - self._reads_at_steady0) / dt, 1)
        log(f"align+decon (fused): {n_reads} reads → {n_sub} subreads, "
            f"{len(self.cands)} BC-UMI candidates"
            + (f", {self.n_deferred} reads via unfused fallback"
               if self.n_deferred else "")
            + f" ({time.time() - t0:.1f}s)")

    def _slow_groups(self, spec, sample, codes, lengths, names, quals):
        """Unfused recompute of deferred reads (those with more kept
        chains than fused-step slots), regrouped per input row for
        in-order interleave by assemble_batch. Rows pad to a fixed 512
        bucket so the unfused programs compile exactly once per run."""
        from .align.aligner import extract_records
        from .io.encode import PAD
        from .ops.extend import extend_records_host
        from .stages.decon import run_decon

        if self._fallback_aligner is None:
            self._fallback_aligner = PanelAligner(self.index)
        n = len(lengths)
        Nb = 512
        while Nb < n:
            Nb *= 2
        L = codes.shape[1]
        sc = np.full((Nb, L), PAD, np.int8)
        sc[:n] = codes
        sl = np.zeros(Nb, np.int32)
        sl[:n] = np.asarray(lengths)
        snames = list(names) + [""] * (Nb - n)
        squals = list(quals) + [b""] * (Nb - n)
        ch = self._fallback_aligner._chain(sc, sl)
        rec = extract_records(ch, self.index, sl)
        # pin the record-axis buckets: deferred-read counts vary per flush
        # window, and without a floor the pow2 buckets land on shapes the
        # prewarm never compiled (~5 s program-load each over a
        # remote-compile tunnel, paid mid-steady-state). 4096 records
        # covers DEFER_CAP reads x ~8 chains; larger counts escalate to
        # the next pow2 (one extra one-time compile). CPU backends skip
        # the floor — compiles are cheap there and tests stay fast.
        import jax as _jax
        mb = 4096 if _jax.default_backend() != "cpu" else 0
        extend_records_host(rec, self.index, sc, sl, min_bucket=2 * mb)
        out = run_decon(spec, sc, sl, snames, squals, rec,
                        self.index.names, sample,
                        dev_codes=ch.get("dev_codes"), min_bucket=mb)
        groups: dict = {}

        def grp(gi):
            return groups.setdefault(int(gi), {"sub": [], "bc": [],
                                               "eds": [], "polyA": [],
                                               "raw": []})

        rd = rec.read_idx
        for k, ri in enumerate(out.sub_rec):
            grp(rd[ri])["sub"].append(
                (out.sub_names[k], out.sub_seqs[k], out.sub_quals[k]))
        for k, ri in enumerate(out.bcumi_rec):
            g = grp(rd[ri])
            g["bc"].append((out.bcumi_names[k], out.bcumi_seqs[k]))
            if spec.bcumi_rule == "rev_slideseq":
                g["polyA"].append(out.polyA[k])
        if out.eds_rec is not None:
            for k, ri in enumerate(out.eds_rec):
                grp(rd[ri])["eds"].append(out.eds_rows[k])
        for (ri, key) in (out.raw_rows or []):
            grp(rd[ri])["raw"].append(key)
        return groups

    def eds_artifacts(self, outdir, sample) -> list:
        """Mode-specific stats artifacts write_eds produces (resume set)."""
        n = self.spec.name
        if n in ("5p10XTCR", "3p10XTCR"):
            return [f"{outdir}/{sample}_eds.csv"]
        if n == "3pXCR_slideseq":
            return [f"{outdir}/{sample}_eds_names.csv.gz",
                    f"{outdir}/{sample}_polyA.fasta.gz"]
        return []

    def write_eds(self, outdir, sample):
        if self.resumed:
            return   # stats artifacts were written by the original run
        if self.spec.name == "5p10XTCR":
            _atomic_to_csv(pd.DataFrame(np.array(self.eds_rows, dtype=object)),
                           f"{outdir}/{sample}_eds.csv")
        elif self.spec.name == "3p10XTCR":
            v, c = np.unique(np.asarray(self.eds_rows), return_counts=True)
            df = pd.DataFrame({0: v, 1: c}).sort_values(1, ascending=False)
            _atomic_to_csv(df, f"{outdir}/{sample}_eds.csv")
        elif self.spec.name == "3pXCR_slideseq":
            # per-hit edit distances for ALL pre-filter adapter hits,
            # names with the fasta '>' prefix (utils.py:459-461; the
            # reference pigzes the csv, so the artifact is .csv.gz)
            _atomic_to_csv(pd.DataFrame(
                {0: [n for n, _ in self.eds_rows],
                 1: [d for _, d in self.eds_rows]}),
                f"{outdir}/{sample}_eds_names.csv.gz", index=None)
            with FastaWriter(f"{outdir}/{sample}_polyA.fasta.gz") as f:
                for n, s in self.polyA:
                    f.write(n, s)


def _atomic_to_csv(df, path, **kw):
    tmp = path + ".tmp"
    # infer compression from the FINAL name (pandas would see only .tmp)
    kw.setdefault("compression", "gzip" if path.endswith(".gz") else None)
    df.to_csv(tmp, **kw)
    os.replace(tmp, path)


def _sharded_match_fn(spec, bcs_array, wl_shards, data_shards=1):
    """Multi-chip whitelist matcher over a (data × wl) mesh: candidate
    batches shard over 'data', the whitelist over 'wl'
    (parallel/sharded.build_sharded_match: ICI all-gather of per-shard
    best/runner summaries; psum'd counts). Returns a callable with the
    BarcodeMatcher.match signature; batches are padded to a multiple of
    data_shards and pad rows dropped from the result."""
    from .parallel.sharded import (ShardedWhitelist, build_sharded_match,
                                   make_mesh)
    mesh = make_mesh(data_shards, wl_shards)
    swl = ShardedWhitelist(bcs_array, spec.barcode, wl_shards)
    arrs = swl.device_arrays(mesh)
    fn = build_sharded_match(swl, mesh)

    def match(q, qlen):
        n = q.shape[0]
        n_pad = -(-n // data_shards) * data_shards - n
        if n_pad:
            q = np.pad(q, ((0, n_pad), (0, 0)))
            qlen = np.pad(qlen, (0, n_pad))
        bc, score, status, umi, _ = fn(q, qlen, arrs)
        return {"bc_idx": np.asarray(bc)[:n], "score": np.asarray(score)[:n],
                "status": np.asarray(status)[:n],
                "umi": np.asarray(umi)[:n]}
    return match


def _match_fingerprint(spec, bcs_array, cands):
    """Cheap identity of a barcode-match run: candidate set + whitelist +
    chemistry. A checkpoint from a different input/whitelist/mode must not
    be resumed (stale-assignments hazard)."""
    import hashlib
    h = hashlib.sha1()
    for n in cands.head(128) + cands.tail(128):
        h.update(n.encode())
    return {"spec": spec.name, "n_candidates": len(cands),
            "n_whitelist": int(len(bcs_array)),
            "names_sha1": h.hexdigest()}


def match_barcodes(spec, bcs_array, cands, outdir, sample,
                   batch=4096, force=False, wl_shards=1, data_shards=1,
                   prematched=None, matcher=None):
    """Whitelist match of accumulated candidates → per-read assignment df
    + score histogram artifacts. The full assignment table persists as
    {sample}_assignments.csv.gz (our equivalent of the reference's
    _matching.sam stage checkpoint) and is reloaded on resume when the
    run fingerprint (input candidates + whitelist + chemistry) matches.

    prematched: per-candidate results already computed by the fused decon
    step (DeconRun.prematch) — rows with pending=True (candidates from
    reads the fused step deferred) are matched here; everything else is
    used as-is. Artifacts are identical either way.

    cands: a CandidateStore (spill-backed; consumed by sequential
    streaming so host memory stays bounded)."""
    from .io.candidate_store import CandidateStore
    if not isinstance(cands, CandidateStore):
        raise TypeError("match_barcodes now takes a CandidateStore "
                        "(CandidateStore.from_lists(names, seqs))")
    apath = f"{outdir}/{sample}_assignments.csv.gz"
    mpath = apath + ".meta.json"
    fp = _match_fingerprint(spec, bcs_array, cands)
    if not force and os.path.isfile(apath):
        meta = None
        if os.path.isfile(mpath):
            with open(mpath) as f:
                meta = json.load(f)
        if meta != fp:
            log("resume: assignments checkpoint fingerprint mismatch "
                "(different input/whitelist/chemistry) — recomputing")
        else:
            df = pd.read_csv(apath, keep_default_na=False,
                             dtype={"name": str, "bc": str, "umi": str})
            umi_len = spec.barcode.umi_len
            codes, _ = encode_batch(
                [u if u else "" for u in df.umi], max_len=umi_len)
            bc_of = {b: i for i, b in enumerate(bcs_array)}
            res = {"umi": codes, "score": df.score.to_numpy(),
                   "status": df.status.to_numpy(),
                   "bc_idx": np.asarray([bc_of.get(b, -1) for b in df.bc],
                                        np.int32)}
            log(f"resume: {len(df)} barcode assignments loaded from "
                f"{os.path.basename(apath)}")
            spath = f"{outdir}/{sample}_barcode_scores.csv"
            if not os.path.isfile(spath):
                # shard-merged outdirs carry the assignment checkpoint but
                # not the score histogram (tools/merge_shards.py) —
                # rebuild it from the loaded table
                status = res["status"]
                vis = ((status == ACCEPT) | (status == LOW_AS) |
                       (status == BAD_UMI))
                sdf = counting.barcode_scores_table(res["score"][vis])
                sdf.columns = ["score", "count"]
                sdf.to_csv(spath, index=None)
                counting.save_score_plot(
                    f"{outdir}/{sample}_barcode_scores.pdf", sdf, 8)
            return df, res
    t0 = time.time()
    m = matcher or BarcodeMatcher(bcs_array, spec.barcode)
    Lq = MATCH_LQ
    if len(cands) and wl_shards <= 1 and data_shards <= 1:
        # AOT-cached standalone match program (no-op on CPU / when the
        # fused path's background loader already warmed it)
        m.enable_aot(batch, Lq, log=log)
    if prematched is not None and wl_shards <= 1 and data_shards <= 1:
        res = {k: np.asarray(prematched[k]).copy()
               for k in ("bc_idx", "score", "status", "umi")}
        pend = np.where(prematched["pending"])[0]
        row_iter = cands.rows(pend)      # one sequential pass, ascending
        for s in range(0, len(pend), batch):
            rows = pend[s:s + batch]
            chunk = [sq for _, sq in itertools.islice(row_iter, len(rows))]
            q, qlen = encode_batch(chunk, max_len=Lq)
            n = q.shape[0]
            if n < batch:
                q = np.pad(q, ((0, batch - n), (0, 0)))
                qlen = np.pad(qlen, (0, batch - n))
            r = m.match(q, qlen)
            for k in res:
                res[k][rows] = r[k][:n]
    else:
        match = m.match
        if wl_shards > 1 or data_shards > 1:
            match = _sharded_match_fn(spec, bcs_array, wl_shards,
                                      data_shards)
            log(f"whitelist match on a {data_shards}x{wl_shards} "
                f"(data x wl) device mesh")
        all_res = {k: [] for k in ("bc_idx", "score", "status", "umi")}
        for _, bs in cands.iter_batches(batch):
            q, qlen = encode_batch(bs, max_len=Lq)
            n = q.shape[0]
            if n < batch:     # pad the tail: exact-n shapes would recompile
                q = np.pad(q, ((0, batch - n), (0, 0)))
                qlen = np.pad(qlen, (0, batch - n))
            r = match(q, qlen)
            for k in all_res:
                all_res[k].append(r[k][:n])
        res = {k: np.concatenate(v) if v else np.zeros(0, np.int32)
               for k, v in all_res.items()}
    status = res["status"]
    acc = status == ACCEPT
    # histogram over reads that would appear with flag==0 in the STAR SAM
    vis = acc | (status == LOW_AS) | (status == BAD_UMI)
    scores_df = counting.barcode_scores_table(res["score"][vis])
    scores_df.columns = ["score", "count"]
    scores_df.to_csv(f"{outdir}/{sample}_barcode_scores.csv", index=None)
    counting.save_score_plot(f"{outdir}/{sample}_barcode_scores.pdf",
                             scores_df, 8)
    umi_strs = ["" if not a else decode(u)
                for a, u in zip(acc, res["umi"])]
    df = pd.DataFrame({
        "name": cands.names_list(),
        "bc": m.bc_strings(res["bc_idx"]),
        "umi": umi_strs,
        "score": res["score"],
        "status": status,
    })
    _atomic_to_csv(df, apath, index=False)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(fp, f)
    os.replace(tmp, mpath)
    log(f"barcode match: {acc.sum()}/{len(cands)} accepted vs "
        f"{len(bcs_array)} whitelist ({time.time() - t0:.1f}s)")
    return df, res


def dedup_outputs(spec, df, res, outdir, sample, knee_umi_name="knee"):
    """_bcumi_dedup.csv + knee plot(s) (process_matching_* second half)."""
    acc = df[df.status == ACCEPT]
    umi_codes = res["umi"][(df.status == ACCEPT).to_numpy()]
    table = counting.umi_dedup_table(acc.bc.to_numpy(), umi_codes)
    table.to_csv(f"{outdir}/{sample}_bcumi_dedup.csv")
    counting.save_knee_plot(f"{outdir}/{sample}_{knee_umi_name}.pdf",
                            table.umi_cnt.to_numpy(), "log10 UMI counts")
    if knee_umi_name != "knee":
        counting.save_knee_plot(f"{outdir}/{sample}_knee_reads.pdf",
                                table.read_cnt.to_numpy(), "log10 read counts")
    return table


def genome_stage(spec, outdir, sample, genome_ref, tag_map, batch_size=512,
                 force=False):
    """Align subreads to the genome with the splice preset, write the
    CB/UB/XT-tagged BAM (reference align_genome.sh `minimap2 -x splice` +
    utils.py:801-827). Intron-spanning chains are split into exon blocks
    (align/aligner.extract_exons); each exon is base-level aligned by the
    native banded DP and the gaps between exons become N CIGAR ops."""
    done = [f"{outdir}/{sample}_genome_tagged.bam",
            f"{outdir}/{sample}_genome_tagged.bam.bai",
            f"{outdir}/{sample}_trns_ct.csv"]
    if not force and all(os.path.isfile(p) for p in done):
        log("resume: tagged genome BAM present, skipping genome stage")
        return
    import heapq
    import pickle
    import re
    import tempfile
    t0 = time.time()
    gindex = PanelIndex.from_fasta(genome_ref)
    galigner = PanelAligner(gindex, preset="splice")
    sub_path = f"{outdir}/{sample}_deconcat.fastq.gz"
    from .io.encode import COMPLEMENT
    cig_re = re.compile(r"(\d+)([=XIDN])")

    # Streamed external sort (VERDICT r2 weak #6: the previous version
    # materialized and sorted EVERY tagged record in RAM — unusable at
    # whole-genome scale). Each input batch becomes one coordinate-sorted
    # spill of fully-formed records (CIGARs included, so the merge phase
    # is IO-only); a k-way heap merge writes the final BAM. Peak memory is
    # one batch of records + the merge heads.
    spills: list = []
    n_rows = 0
    all_trns: list = []
    tmpdir = tempfile.mkdtemp(prefix="nr_genome_", dir=outdir)

    def finish_rows(rows):
        """rows → final BAM-ready tuples with base-level CIGARs."""
        q_segs, t_segs, seg_of = [], [], []
        for (rid, ts, flag, name, blocks, codes, qual, _mq) in rows:
            stored = COMPLEMENT[codes][::-1] if flag & 16 else codes
            lo = len(q_segs)
            for (t_lo, t_hi, q_lo, q_hi) in blocks:
                q_segs.append(stored[q_lo:q_hi])
                t_segs.append(gindex.seq_codes[rid][t_lo:t_hi])
            seg_of.append(slice(lo, len(q_segs)))
        cigars, scores, nms = banded_align_batch(q_segs, t_segs, band=160)
        out = []
        for k, (rid, ts, flag, name, blocks, codes, qual, mq) in \
                enumerate(rows):
            cb, ub, xt = tag_map[name]
            if flag & 16:
                stored = COMPLEMENT[codes][::-1]
                squal = qual[::-1]
            else:
                stored, squal = codes, qual
            sl = seg_of[k]
            cig = []
            if blocks[0][2]:
                cig.append((blocks[0][2], "S"))
            as_sum = nm_sum = 0
            for e, si in enumerate(range(sl.start, sl.stop)):
                if e:
                    t_gap = blocks[e][0] - blocks[e - 1][1]
                    q_gap = blocks[e][2] - blocks[e - 1][3]
                    if t_gap > 0:
                        cig.append((t_gap, "N"))
                    if q_gap > 0:
                        cig.append((q_gap, "I"))
                cig += [(int(n), op) for n, op in
                        cig_re.findall(cigars[si])]
                as_sum += int(scores[si])
                nm_sum += int(nms[si])
            tail = len(stored) - blocks[-1][3]
            if tail:
                cig.append((tail, "S"))
            out.append((rid, ts, flag, name, cig, stored, squal, mq,
                        {"NM": nm_sum, "AS": as_sum,
                         "CB": cb, "UB": ub, "XT": xt}))
        return out

    for bi, batch in enumerate(
            fastq.iter_batches(sub_path, batch_size, max_len=4096)):
        rec, exons = galigner.align_with_exons(batch.codes, batch.lengths)
        prim = rec.flag < 20                     # utils.py:812
        rows = []
        for r in np.where(prim)[0]:
            i = int(rec.read_idx[r])
            name = batch.names[i]
            if name not in tag_map:
                continue
            rows.append((int(rec.ref_id[r]), int(rec.tstart[r]),
                         int(rec.flag[r]), name, exons[r],
                         batch.codes[i, :batch.lengths[i]].copy(),
                         batch.quals[i], int(rec.mapq[r])))
        rows.sort(key=lambda x: (x[0], x[1]))
        done_rows = finish_rows(rows)
        n_rows += len(done_rows)
        path = os.path.join(tmpdir, f"spill_{bi}.pkl")
        with open(path, "wb") as f:
            for row in done_rows:
                pickle.dump(row, f, protocol=4)
        spills.append(path)

    def read_spill(path):
        with open(path, "rb") as f:
            while True:
                try:
                    yield pickle.load(f)
                except EOFError:
                    return

    bam_path = f"{outdir}/{sample}_genome_tagged.bam"
    with BAMWriter(bam_path, gindex.names,
                   [len(s) for s in gindex.seq_codes], index=True) as w:
        merged = heapq.merge(*[read_spill(p) for p in spills],
                             key=lambda row: (row[0], row[1]))
        for (rid, ts, flag, name, cig, stored, squal, mq, tags) in merged:
            w.write(name, flag, rid, ts, mq, cig, stored, squal, tags=tags)
            all_trns.append(tags["XT"])
    for p in spills:
        os.unlink(p)
    os.rmdir(tmpdir)
    counting.trans_counts_table(all_trns).to_csv(
        f"{outdir}/{sample}_trns_ct.csv", index=None)
    log(f"genome stage: {n_rows} tagged records → {bam_path} "
        f"(streamed {len(spills)}-spill merge, {time.time() - t0:.1f}s)")


def _load_whitelist(path, spec_name):
    if not path or not os.path.isfile(path):
        # the bundled data ships without 3M-february-2018.txt.gz (stripped
        # large blob, reference .MISSING_LARGE_BLOBS:1) — fail with a clear
        # message instead of a FileNotFoundError traceback
        raise SystemExit(
            f"[nanoranger-tpu] whitelist not found: {path!r}. Mode "
            f"{spec_name} needs --barcodes pointing at a whitelist "
            "(.txt/.txt.gz/.tsv.gz) or a cell-called 10x .h5.")
    min_genes = 4 if spec_name == "3p10XTCR_nuc" else 20
    return whitelist.load(path, min_genes=min_genes)


def _tag_map_from_df(df):
    """name → (CB, UB, XT) for accepted reads; XT parsed from the decon
    read name {qname}_{qstrt}_{qend}_{flag}_{trans}.

    Deliberate fix of a reference defect (SURVEY §7): the reference takes
    `name.split('_')[4]` (utils.py:745), which truncates transcript names
    containing '_' — the bundled panels DO contain such names
    (e.g. `RUNX1T1-204|ENST00000422361.6_2450`), so its XT tags and
    _trns_ct silently lose the tail. The transcript is the LAST field, so
    joining parts[4:] recovers it exactly."""
    out = {}
    for name, bc, umi, status in zip(df.name, df.bc, df.umi, df.status):
        if status != ACCEPT:
            continue
        parts = name.split("_")
        trns = "_".join(parts[4:]) if len(parts) > 4 else ""
        out[name] = (bc, umi, trns)
    return out


def _v_panel_paths(mode, xpecies, trns_ref):
    """V-gene panels for the native clonotyper. A V panel given as the
    transcriptome ref (5p10XTCR/RTX/3p10XTCR_nuc defaults) is reused
    directly; 3' modes align to C-gene panels, so the species' bundled V
    panels are used instead."""
    if trns_ref and "_V_" in os.path.basename(trns_ref):
        return [trns_ref]
    mouse = (xpecies == "mouse") or (not xpecies and mode in
                                     ("3pXCR_slideseq", "3p10XTCR"))
    names = (["TR_V_mouse.fa", "IG_V_mouse.fa"] if mouse
             else ["TR_V_human.fa"])
    return [os.path.join(DATA_DIR, n) for n in names
            if os.path.isfile(os.path.join(DATA_DIR, n))]


def _c_panel_paths(mode, xpecies, trns_ref):
    """Constant-region panels for J/C locus assignment. A C panel given as
    the transcriptome ref (3' modes) is reused; otherwise the species'
    bundled TR/XR C panels."""
    if trns_ref and "_C_" in os.path.basename(trns_ref):
        return [trns_ref]
    mouse = (xpecies == "mouse") or (not xpecies and mode in
                                     ("3pXCR_slideseq", "3p10XTCR"))
    names = (["XR_C_mouse.fa"] if mouse
             else ["TR_C_human.fa", "IG_C_human.fa"])
    return [os.path.join(DATA_DIR, n) for n in names
            if os.path.isfile(os.path.join(DATA_DIR, n))]


def _ensure_clonotypes(mode, sub_path, outdir, sample, trns_ref,
                       xpecies) -> bool:
    """Make clone exports available: MiXCR outputs win when present
    (external boundary preserved, reference scripts/mixcr.sh); otherwise
    the native clonotyper (vdj/) produces compatible tables. Returns True
    when clone tables exist afterwards."""
    if clone_stage.have_mixcr_outputs(sample, outdir):
        return True
    v_fastas = _v_panel_paths(mode, xpecies, trns_ref)
    if not v_fastas:
        log("no V-gene panel available for the native clonotyper; "
            f"run mixcr on {sub_path} then re-run for clone tables")
        return False
    from .vdj import call_clonotypes
    call_clonotypes(sub_path, v_fastas, outdir, sample,
                    c_fastas=_c_panel_paths(mode, xpecies, trns_ref),
                    log=log)
    return clone_stage.have_mixcr_outputs(sample, outdir)


# ---------------------------------------------------------------------------

def run_pipeline(mode, infile, outdir, sample, trns_ref=None, genome_ref=None,
                 barcodes=None, xpecies=None, batch_size=2048, force=False,
                 wl_shards=1, data_shards=1, scrub=False):
    _honor_jax_platforms_env()       # library entry too, not only main()
    _enable_compilation_cache()
    os.makedirs(outdir, exist_ok=True)
    spec = chemistry.get(mode)
    dflt = MODE_DEFAULTS[mode]
    trns_ref = trns_ref or os.path.join(DATA_DIR, dflt[0])
    if dflt[1] and not genome_ref:
        genome_ref = os.path.join(DATA_DIR, dflt[1])
    if dflt[2] and not barcodes:
        barcodes = os.path.join(DATA_DIR, dflt[2])

    tele = Telemetry(mode, infile)
    ts = time.time()
    # modes whose whitelist is known up front (everything but the
    # data-driven 3p10XGEX) load it early so the fused decon step can
    # match candidates inline (stages/cli_step.py); failures fall back to
    # the unfused flow, which reports them identically after decon
    bcs = None
    matcher = None
    if mode not in ("RTX", "3p10XGEX") and wl_shards <= 1 and \
            data_shards <= 1 and \
            os.environ.get("NANORANGER_NO_FAST", "") != "1":
        try:
            bcs = _load_whitelist(barcodes, mode)
        except SystemExit:
            bcs = None
        if bcs is not None and len(bcs):
            from .stages.barcode import BarcodeMatcher
            matcher = BarcodeMatcher(bcs, spec.barcode)
    run = DeconRun(spec, infile, outdir, sample, trns_ref, batch_size,
                   force=force, data_shards=data_shards, matcher=matcher)
    run.write_eds(outdir, sample)
    tele.stage("align_decon", time.time() - ts, run.n_reads,
               subreads=run.n_sub, candidates=len(run.cands),
               resumed=run.resumed, deferred_reads=run.n_deferred or None,
               steady_reads_per_s=getattr(run, "steady_reads_per_s", None),
               phase_s={k: round(v, 2) for k, v in run.phase_s.items()}
               if getattr(run, "phase_s", None) else None)

    if mode == "RTX":
        ts = time.time()
        _ensure_clonotypes(mode, run.sub_path, outdir, sample, trns_ref,
                           xpecies)
        tele.stage("clonotypes", time.time() - ts)
        tele.write(outdir, sample)
        return

    # whitelist
    if mode == "3p10XGEX":
        _atomic_to_csv(pd.Series(run.raw_counts, name="read_count"),
                       f"{outdir}/{sample}_bc_read_count.csv")
        # reference artifact name parity: the raw 16-mer counter is
        # dumped as {sample}_bc_count.json too (utils.py:1403-1404)
        tmp = f"{outdir}/{sample}_bc_count.json.tmp"
        with open(tmp, "w") as f:
            json.dump({k: int(v) for k, v in run.raw_counts.items()}, f)
        os.replace(tmp, f"{outdir}/{sample}_bc_count.json")
        if barcodes and os.path.isfile(barcodes):
            bcs = whitelist.data_driven(run.raw_counts, barcodes)
        else:
            log("WARNING: master whitelist missing; using observed "
                "barcodes with count>20 (reference requires "
                "3M-february-2018.txt.gz)")
            bcs = np.asarray([b for b, c in run.raw_counts.items()
                              if c > 20 and len(b) == 16 and "N" not in b
                              and "." not in b])
    else:
        if bcs is None:
            bcs = _load_whitelist(barcodes, mode)
    if len(bcs) == 0:
        log("no whitelist barcodes — stopping after decon")
        tele.write(outdir, sample)
        return

    ts = time.time()
    df, res = match_barcodes(spec, bcs, run.cands,
                             outdir, sample, force=force,
                             wl_shards=wl_shards, data_shards=data_shards,
                             prematched=None if run.resumed else
                             run.prematch, matcher=matcher)
    tele.stage("barcode_match", time.time() - ts, len(run.cands),
               accepted=int((df.status == ACCEPT).sum()),
               whitelist=int(len(bcs)))

    ts = time.time()
    if mode == "5p10XGEX":
        dedup_outputs(spec, df, res, outdir, sample)
        tele.stage("dedup", time.time() - ts)
        if genome_ref and os.path.isfile(genome_ref):
            ts = time.time()
            genome_stage(spec, outdir, sample, genome_ref,
                         _tag_map_from_df(df), force=force)
            tele.stage("genome_tag", time.time() - ts)
    elif mode in ("5p10XTCR", "3p10XTCR_nuc"):
        dedup_outputs(spec, df, res, outdir, sample, knee_umi_name="knee_UMI")
        tele.stage("dedup", time.time() - ts)
        ts = time.time()
        if _ensure_clonotypes(mode, run.sub_path, outdir, sample, trns_ref,
                              xpecies):
            _, cloneID = clone_stage.clone_filt_5p10X(sample, outdir)
            acc = df[df.status == ACCEPT]
            clone_stage.clone_bcumi_join(
                cloneID, acc.name.tolist(), acc.bc.to_numpy(),
                acc.umi.tolist(), f"{outdir}/{sample}_clone_bcumi.csv.gz")
        tele.stage("clonotypes", time.time() - ts)
    elif mode in ("3pXCR_slideseq", "3p10XTCR"):
        if _ensure_clonotypes(mode, run.sub_path, outdir, sample, trns_ref,
                              xpecies):
            _, cloneID = clone_stage.clone_filt_slideseq(sample, outdir)
            acc = df[df.status == ACCEPT]
            clone_stage.clone_bcumi_join(
                cloneID, acc.name.tolist(), acc.bc.to_numpy(),
                acc.umi.tolist(), f"{outdir}/{sample}_clone_bcumi.csv.gz",
                clone_first=True)
        tele.stage("clonotypes", time.time() - ts)
    elif mode == "3p10XGEX":
        acc = df[df.status == ACCEPT]
        umi_codes = res["umi"][(df.status == ACCEPT).to_numpy()]
        trns = [n.split("/ccs_")[-1].split("_") for n in acc.name]
        trns = ["_".join(t[3:]) if len(t) > 3 else "" for t in trns]
        trns = [t.split("|")[-1].split("_")[0] if "|" in t else t
                for t in trns]                          # utils.py:1483-1486
        with gzip.open(f"{outdir}/{sample}_quads.json.gz", "wt") as f:
            json.dump(counting.quads_dict(acc.bc.to_numpy(), umi_codes,
                                          trns), f)
        genes, cells, cnts = counting.count_matrix(
            acc.bc.to_numpy(), umi_codes, np.asarray(trns, dtype=object))
        counting.write_mtx(f"{outdir}/{sample}", genes, cells, cnts)
        log(f"count matrix: {len(genes)} genes × {len(cells)} cells, "
            f"{len(cnts)} nonzeros")
        tele.stage("count_matrix", time.time() - ts,
                   genes=len(genes), cells=len(cells))
    if scrub:
        # reference cleanup analogue (pipeline.py:249-255 removes its
        # STAR index dir, _matching.sam, _bcreads fasta, untagged BAM).
        # This engine never materializes those; its only stage
        # checkpoint is the assignment table — removing it trades the
        # resume capability for the reference's post-run footprint.
        for p in (f"{outdir}/{sample}_assignments.csv.gz",
                  f"{outdir}/{sample}_assignments.csv.gz.meta.json"):
            if os.path.isfile(p):
                os.unlink(p)
        log("scrub: removed stage checkpoints (re-runs recompute)")
    tele.write(outdir, sample)


def _honor_jax_platforms_env():
    """Re-apply the JAX_PLATFORMS env var over any site-level override.

    Some deployments register a custom PJRT plugin from sitecustomize and
    force-select it via jax.config, which silently discards the user's
    JAX_PLATFORMS choice (e.g. CPU smoke runs of this CLI). Respect the
    env var if the backend isn't initialized yet."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    try:
        if (jax.config.jax_platforms or "") != want:
            jax.config.update("jax_platforms", want)
    except RuntimeError:
        pass  # backend already live; too late to switch


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the pipeline compiles one program
    per (stage, shape-bucket) and reruns are common (resume idiom,
    multi-sample studies). Respects an existing user setting."""
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    if jax.default_backend() == "cpu":
        # CPU AOT blobs embed machine-feature flags; reloading them on a
        # host with different features risks SIGILL (cpu_aot_loader
        # warning). CPU paths compile fast anyway — cache only
        # accelerator executables.
        return
    cache = os.environ.get(
        "NANORANGER_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "nanoranger_tpu",
                     "xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only


def main(argv=None):
    _honor_jax_platforms_env()
    _enable_compilation_cache()
    p = argparse.ArgumentParser(prog="nanoranger-tpu")
    p.add_argument("--cores", type=str, default=None)   # accepted, unused
    p.add_argument("--trns_ref", type=str)
    p.add_argument("--genome_ref", type=str)
    p.add_argument("--infile", type=str, required=True)
    p.add_argument("--outdir", type=str, required=True)
    p.add_argument("--expname", type=str, required=True)
    p.add_argument("--barcodes", type=str)
    p.add_argument("--split", default=False, action="store_true")
    p.add_argument("--mode", type=str, required=True,
                   choices=chemistry.names())
    p.add_argument("--xpecies", type=str)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--force", default=False, action="store_true",
                   help="recompute all stages, ignoring existing artifacts")
    p.add_argument("--scrub", default=False, action="store_true",
                   help="remove stage-checkpoint intermediates after a "
                        "successful run (reference pipeline.py:249-255 "
                        "cleanup analogue; disables resume)")
    p.add_argument("--wl_shards", type=int, default=1,
                   help="shard the whitelist match over this many devices "
                        "(jax.sharding mesh; 1 = single device)")
    p.add_argument("--data_shards", type=int, default=1,
                   help="data-parallel device count: streamed align/decon "
                        "batches round-robin over N devices and the "
                        "whitelist match runs on a (data x wl) mesh; "
                        "artifacts are byte-identical to --data_shards 1 "
                        "(deterministic in-order merge)")
    a = p.parse_args(argv)
    run_pipeline(a.mode, a.infile, a.outdir, a.expname, a.trns_ref,
                 a.genome_ref, a.barcodes, a.xpecies, a.batch_size,
                 force=a.force, wl_shards=a.wl_shards,
                 data_shards=a.data_shards, scrub=a.scrub)


if __name__ == "__main__":
    main()
