"""FULL barcode-assignment parity vs an exhaustive arbiter (VERDICT r3
next-step #2).

Scores EVERY BC-UMI candidate of TCR3 (5p10XTCR) and 1026_mtDNA
(5p10XGEX) against the FULL 737,280-barcode whitelist with an exhaustive
arbiter, and diffs the engine's screened matcher (product screen + exact
DP + rc pass — the replacement for STAR EndToEnd,
reference scripts/barcode_align.sh:14-41, utils.py:699-716) against it.

Arbiter construction (sound, not sampled):
  - The end-to-end score of a candidate vs a padded whitelist row is at
    most bc_len (=16): only the 16 barcode-core columns can score (+1
    match), N-pad columns are free, and every indel/mismatch costs. A
    score-16 alignment therefore requires the candidate to contain the
    barcode as an EXACT contiguous 16-mer. So exact hash lookup of every
    16-mer window (forward and revcomp) resolves perfect hits exactly:
    number of distinct score-16 barcodes (ties ⇒ multimap,
    outFilterMultimapScoreRange 0) and the rc tie/beat decision.
  - Candidates with NO exact forward hit are scored by full DP
    (ops.sw.sw_end2end_xla — the same scorer the device kernels are
    validated against in tests/test_sw.py) over ALL whitelist rows,
    forward and reverse, in chunks.

Engine-vs-arbiter divergences are classified, never hidden:
  - fwd_screen_recall: the engine's top-k screen missed the true best
    forward alignment (engine best score < arbiter best score).
  - rc_screen_recall: the screened rc pass missed the true rc best and
    the acceptance decision flipped (arbiter rc >= fwd where engine's
    screened rc < fwd, or vice-versa direction is impossible).
  - UNEXPLAINED: anything else (fails the report).

Usage: JAX_PLATFORMS=cpu python tools/match_parity.py
         [--samples TCR3,1026_mtDNA_ASXL1_NRAS_SF3B1] [--n-reads 1200]
Writes tests/goldens/match_parity.json (asserted by
tests/test_match_parity.py).
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

DATA = os.path.join(REPO, "data")

# sample -> (mode, trns_ref or None for synthetic, whitelist file).
# TCR3/1026 cover the 30/40-pad 5' geometry; slideseq_XCR the
# 8+linker+6 AS>=30 geometry (utils.py:625-682); nuc_synthetic the
# 16/28-pad UMI@32/12 geometry (utils.py:1125,1159) on synthetic
# candidates (the reference bundles no nuc sample fastq).
SAMPLES = {
    "TCR3": ("5p10XTCR", "TR_V_human.fa", "737K-august-2016.txt.gz"),
    "1026_mtDNA_ASXL1_NRAS_SF3B1":
        ("5p10XGEX", "panel_MT_trns.fa", "737K-august-2016.txt.gz"),
    "slideseq_XCR": ("3pXCR_slideseq", "XR_C_mouse.fa",
                     "slideseq.matched.barcodes.tsv.gz"),
    "nuc_synthetic": ("3p10XTCR_nuc", None, "737K-august-2016.txt.gz"),
}

ACCEPT, LOW_AS, MULTIMAP, NO_CAND, BAD_UMI, RC_BEST = 0, 1, 2, 3, 4, 6
_RC = {"A": "T", "C": "G", "G": "C", "T": "A"}


def revcomp(s: str) -> str:
    return "".join(_RC.get(c, "N") for c in reversed(s))


def structure_of(bc: str, b) -> str:
    """The scoring core between the N pads: the barcode, or
    bc8+linker+bc6 for slideseq (utils.py:584-595)."""
    if b.slideseq_linker:
        from nanoranger_tpu.chemistry import SLIDESEQ_LINKER
        return bc[:8] + SLIDESEQ_LINKER + bc[8:]
    return bc


def synthetic_candidates(mode, full_wl, n=900, seed=0):
    """Geometry-exercising candidates for modes without a bundled sample:
    exact / 1-sub / 1-ins / 1-del / garbage / revcomp-planted barcodes in
    the mode's extraction layout (for nuc: ~7 adapter chars + bc16 +
    umi12 + tail — reference utils.py:1068-1079)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    names, seqs = [], []
    for k in range(n):
        i = int(rng.integers(0, len(full_wl)))
        bc = list(full_wl[i])
        cls = k % 6
        if cls == 1:
            p = int(rng.integers(0, len(bc)))
            bc[p] = bases[(bases.index(bc[p]) + 1 +
                           int(rng.integers(0, 3))) % 4]
        elif cls == 2:
            p = int(rng.integers(1, len(bc)))
            bc = bc[:p] + [bases[int(rng.integers(0, 4))]] + bc[p:]
        elif cls == 3:
            p = int(rng.integers(0, len(bc)))
            bc = bc[:p] + bc[p + 1:]
        elif cls == 4:
            bc = [bases[int(rng.integers(0, 4))] for _ in range(16)]
        elif cls == 5:
            bc = list(revcomp("".join(bc)))
        pre = "".join(bases[int(rng.integers(0, 4))]
                      for _ in range(int(rng.integers(4, 9))))
        umi = "".join(bases[int(rng.integers(0, 4))] for _ in range(12))
        tail = "".join(bases[int(rng.integers(0, 4))]
                       for _ in range(int(rng.integers(0, 4))))
        names.append(f"syn{k}_cls{cls}")
        seqs.append(pre + "".join(bc) + umi + tail)
    return names, seqs


def candidates_for(sample, mode, trns, n_reads):
    """BC-UMI candidates from a decon-only pipeline run.

    Runs in a CPU SUBPROCESS when the parent sits on an accelerator: the
    decon extraction is host-cheap, and keeping it off the chip avoids
    compiling the CLI programs for the tool's batch shape — the parent
    keeps the chip for the engine + exhaustive arbiter."""
    import subprocess
    outdir = tempfile.mkdtemp(prefix=f"mp_{sample}_")
    out_json = os.path.join(outdir, "cands.json")
    code = (f"import sys; sys.path.insert(0, {REPO!r}); "
            f"from tools.match_parity import _extract_main; "
            f"_extract_main({sample!r}, {mode!r}, {trns!r}, {n_reads}, "
            f"{outdir!r}, {out_json!r})")
    env = {**os.environ, "JAX_PLATFORMS": "cpu"}
    subprocess.run([sys.executable, "-c", code], check=True, env=env)
    with open(out_json) as f:
        d = json.load(f)
    return d["names"], d["seqs"]


def _extract_main(sample, mode, trns, n_reads, outdir, out_json):
    import jax
    jax.config.update("jax_platforms", "cpu")   # sitecustomize override
    from nanoranger_tpu.io.fasta import iter_fasta
    from nanoranger_tpu.pipeline import run_pipeline
    from tools.gen_real_goldens import write_prefix
    src = os.path.join(DATA, "samples", sample + ".fastq.gz")
    infile = os.path.join(outdir, "in.fastq.gz")
    write_prefix(src, infile, n_reads)
    # decon only: nonexistent whitelist/genome stop the run after the
    # decon artifacts are written (clean SystemExit)
    try:
        run_pipeline(mode, infile, outdir, "t",
                     trns_ref=os.path.join(DATA, trns),
                     genome_ref="/nonexistent", barcodes="/nonexistent",
                     batch_size=1024)
    except SystemExit:
        pass                       # whitelist-missing exit is fine
    names, seqs = [], []
    for nm, sq in iter_fasta(f"{outdir}/t_BCUMI.fasta.gz"):
        names.append(nm)
        seqs.append(sq)
    with open(out_json, "w") as f:
        json.dump({"names": names, "seqs": seqs}, f)


def engine_results(seqs, spec, full_wl, batch=2048, Lq=96):
    from nanoranger_tpu.io.encode import encode_batch
    from nanoranger_tpu.stages.barcode import BarcodeMatcher
    m = BarcodeMatcher(full_wl, spec.barcode)
    res = {k: [] for k in ("bc_idx", "score", "status", "umi")}
    for s in range(0, len(seqs), batch):
        q, qlen = encode_batch(seqs[s:s + batch], max_len=Lq)
        n = q.shape[0]
        if n < batch:
            q = np.pad(q, ((0, batch - n), (0, 0)))
            qlen = np.pad(qlen, (0, batch - n))
        r = m.match(q, qlen)
        for k in res:
            res[k].append(r[k][:n])
    return {k: np.concatenate(v) for k, v in res.items()}, m


def exact_hits(seqs, wl_index: dict, b, m: int):
    """Per candidate: (forward exact ref-idx set, rc exact ref-idx set,
    LAST forward occurrence start per ref).

    A score-m alignment (m = structure length) needs the exact
    contiguous structure AND enough N-pad columns to absorb the flanking
    query chars for free: occurrence start i must satisfy i <= pad_left
    and len-(i+m) <= pad_right (extra chars would be -1 insertions). The
    rc row's pads are mirrored."""
    fwd, rc, fpos = [], [], []
    for s in seqs:
        F, R = set(), set()
        first = {}
        for i in range(0, len(s) - m + 1):
            tail = len(s) - (i + m)
            w = s[i:i + m]
            if i <= b.pad_left and tail <= b.pad_right:
                j = wl_index.get(w)
                if j is not None:
                    F.add(j)
                    first[j] = i       # LAST occurrence — the kernels'
                                       # largest-on-path qpos rule
            if i <= b.pad_right and tail <= b.pad_left:
                jr = wl_index.get(revcomp(w))
                if jr is not None:
                    R.add(jr)
        fwd.append(F)
        rc.append(R)
        fpos.append(first)
    return fwd, rc, fpos


def dp_best(seqs_sub, refs_np, umi_ref_offset, ref_chunk=16384,
            cand_chunk=16, log=print, pad_left=None):
    """Exhaustive DP of each candidate vs ALL refs with the per-pair
    scorer (ops.sw.sw_end2end — the reference-DP-validated column-major
    kernel, a code path INDEPENDENT of the engine's one-vs-all flipped
    kernel ops/whitelist_verify, so engine-vs-arbiter agreement
    cross-validates two implementations). The whitelist lives on the
    default JAX device once; one jitted program slices a ref chunk,
    tiles it against a candidate chunk, scores, and reduces to
    (max, smallest-argmax, tie-count) on device.  With pad_left set (and
    a non-CPU backend) the banded per-pair Pallas kernel runs — the
    737K x n_cand sweep takes seconds instead of CPU-days.

    Returns per candidate: (best_score, best_idx(smallest), n_best_refs,
    qpos_of_best, uvalid_of_best)."""
    import functools

    import jax
    import jax.numpy as jnp

    from nanoranger_tpu.io.encode import encode_batch
    from nanoranger_tpu.ops.sw import sw_end2end, sw_end2end_xla
    n = len(seqs_sub)
    R, Lr = refs_np.shape
    pad_R = -(-R // ref_chunk) * ref_chunk
    refs_dev = jnp.asarray(np.pad(refs_np, ((0, pad_R - R), (0, 0)),
                                  constant_values=-1))   # PAD rows score NEG
    q_all, qlen_all = encode_batch(seqs_sub, max_len=96)
    banded = pad_left is not None and jax.default_backend() != "cpu"

    @functools.partial(jax.jit, static_argnames=("C", "Rc"))
    def chunk_best(q, ql, rs, C, Rc):
        rf = jax.lax.dynamic_slice_in_dim(refs_dev, rs, Rc, axis=0)
        qq = jnp.repeat(q, Rc, axis=0)
        qql = jnp.repeat(ql, Rc)
        rfp = jnp.tile(rf, (C, 1))
        rl = jnp.full((C * Rc,), Lr, jnp.int32)
        if banded:
            sc, qp, uv = sw_end2end(qq, qql, rfp, rl, umi_ref_offset,
                                    pad_left=pad_left, full_len=Lr)
            # pad rows (-1-filled) may not score NEG in the banded
            # closed-form pads; forced below either way
        else:
            sc, qp, uv = sw_end2end_xla(qq, qql, rfp, rl, umi_ref_offset)
        # padded whitelist rows are all-PAD: every column scores -1, so
        # they can never reach a real row's max; additionally force NEG
        is_pad = jnp.tile(rf[:, 0] < 0, C)
        sc = jnp.where(is_pad, -(1 << 20), sc).reshape(C, Rc)
        qp = qp.reshape(C, Rc)
        uv = uv.reshape(C, Rc)
        mx = jnp.max(sc, axis=1)
        arg = jnp.argmax(sc, axis=1)                  # smallest index
        cnt = jnp.sum(sc == mx[:, None], axis=1)
        qpb = jnp.take_along_axis(qp, arg[:, None], axis=1)[:, 0]
        uvb = jnp.take_along_axis(uv, arg[:, None], axis=1)[:, 0]
        return mx, arg, cnt, qpb, uvb

    best = np.full(n, -10**9, np.int64)
    bidx = np.full(n, -1, np.int64)
    nbest = np.zeros(n, np.int64)
    qpos = np.full(n, -1, np.int64)
    uval = np.zeros(n, bool)
    t0 = time.time()
    for cs in range(0, n, cand_chunk):
        ce = min(cs + cand_chunk, n)
        C = ce - cs
        q = jnp.asarray(np.pad(q_all[cs:ce],
                               ((0, cand_chunk - C), (0, 0))))
        ql = jnp.asarray(np.pad(qlen_all[cs:ce], (0, cand_chunk - C)))
        outs = []
        for rs in range(0, pad_R, ref_chunk):
            outs.append(chunk_best(q, ql, rs, cand_chunk, ref_chunk))
        for rs, (mx, arg, cnt, qpb, uvb) in zip(
                range(0, pad_R, ref_chunk), map(jax.device_get, outs)):
            for k in range(C):
                g = cs + k
                m, a, c_ = int(mx[k]), rs + int(arg[k]), int(cnt[k])
                if m > best[g]:
                    best[g], bidx[g], nbest[g] = m, a, c_
                    qpos[g] = int(qpb[k])
                    uval[g] = bool(uvb[k])
                elif m == best[g]:
                    nbest[g] += c_
        log(f"  dp {ce}/{n} candidates ({time.time() - t0:.0f}s)")
    return best, bidx, nbest, qpos, uval


def arbiter(seqs, spec, full_wl, refs_np, rc_refs_np, log=print):
    """Exhaustive verdict per candidate: (status, bc_idx, score, umi)."""
    b = spec.barcode
    m = b.umi_ref_offset - b.pad_left          # structure length
    wl_index = {structure_of(s, b): i for i, s in enumerate(full_wl)}
    F, Rh, fpos = exact_hits(seqs, wl_index, b, m)
    n = len(seqs)
    status = np.full(n, NO_CAND, np.int64)
    bc_idx = np.full(n, -1, np.int64)
    score = np.full(n, -10**9, np.int64)
    umi = [""] * n

    need_dp = []
    for j, s in enumerate(seqs):
        if F[j]:
            score[j] = m
            if len(F[j]) > 1 or Rh[j]:
                # several score-m structures, or an equal rc hit: two
                # best alignments -> outFilterMultimapNmax 1 drop
                status[j] = MULTIMAP
                continue
            ref = next(iter(F[j]))
            qp = fpos[j][ref] + m           # largest-qpos optimal path
            if qp + b.umi_len <= len(s):
                status[j] = ACCEPT
                bc_idx[j] = ref
                umi[j] = s[qp:qp + b.umi_len]
            else:
                status[j] = BAD_UMI
                bc_idx[j] = ref
        elif Rh[j]:
            # rc perfect (m) necessarily beats any fwd (<m here)
            score[j] = m - 1  # fwd best unknown; only status matters
            status[j] = RC_BEST
        else:
            need_dp.append(j)

    if need_dp:
        log(f"  exhaustive DP for {len(need_dp)}/{n} candidates "
            f"(no exact forward/rc structure)")
        seqs_sub = [seqs[j] for j in need_dp]
        fb, fi, fn, fq, fu = dp_best(seqs_sub, refs_np, b.umi_ref_offset,
                                     log=log, pad_left=b.pad_left)
        # rc best score only (vs revcomp'd rows; c_rc column)
        c_rc = b.pad_right + m
        rb, _, rn, _, _ = dp_best(seqs_sub, rc_refs_np, c_rc, log=log,
                                  pad_left=b.pad_right)
        for k, j in enumerate(need_dp):
            s = seqs[j]
            score[j] = int(fb[k])
            if rb[k] > fb[k]:
                status[j] = RC_BEST
            elif rb[k] == fb[k]:
                status[j] = MULTIMAP
            elif fn[k] > 1:
                status[j] = MULTIMAP
            elif fb[k] < b.as_min:
                status[j] = LOW_AS
            else:
                qp = int(fq[k])
                if fu[k] and qp >= 0 and qp + b.umi_len <= len(s):
                    status[j] = ACCEPT
                    bc_idx[j] = int(fi[k])
                    umi[j] = s[qp:qp + b.umi_len]
                else:
                    status[j] = BAD_UMI
                    bc_idx[j] = int(fi[k])
    return status, bc_idx, score, umi, len(need_dp)


def classify(e_status, e_bc, e_score, e_umi, a_status, a_bc, a_score,
             a_umi):
    if (e_status == a_status and
            (e_status != ACCEPT or (e_bc == a_bc and e_umi == a_umi))):
        return "ok"
    DROPPED = (MULTIMAP, NO_CAND, RC_BEST)
    if e_status in DROPPED and a_status in DROPPED:
        # read dropped either way AND invisible to every artifact (the
        # score histogram shows only ACCEPT/LOW_AS/BAD_UMI rows,
        # utils.py:728-735) — a pure status-label difference
        return "both_dropped_status_differs"
    if e_status != ACCEPT and a_status != ACCEPT:
        # dropped either way; LOW_AS/BAD_UMI rows differ only in the
        # score-histogram artifact
        return "dropped_histogram_only"
    if (a_status in (RC_BEST, MULTIMAP)) and e_status in (ACCEPT, LOW_AS,
                                                          BAD_UMI):
        # exhaustive rc/tie beats what the screened pass saw
        return "rc_screen_recall"
    if a_score > e_score:
        return "fwd_screen_recall"
    return "UNEXPLAINED"


def run_sample(sample, n_reads, log=print):
    from nanoranger_tpu import chemistry
    from nanoranger_tpu.io import whitelist as wl
    from nanoranger_tpu.io.encode import COMPLEMENT, decode

    mode, trns, wl_file = SAMPLES[sample]
    spec = chemistry.get(mode)
    full = wl.load(os.path.join(DATA, wl_file))
    if trns is None:
        log(f"[match-parity] {sample} ({mode}): synthetic candidates")
        names, seqs = synthetic_candidates(mode, full, n=min(n_reads, 900))
    else:
        log(f"[match-parity] {sample} ({mode}): extracting candidates")
        names, seqs = candidates_for(sample, mode, trns, n_reads)
    log(f"  {len(seqs)} candidates")
    eng, m = engine_results(seqs, spec, full)
    refs_np, _ = wl.padded_refs(full, spec.barcode)
    rc_refs_np = COMPLEMENT[refs_np][:, ::-1]
    a_status, a_bc, a_score, a_umi, n_dp = arbiter(
        seqs, spec, full, refs_np, rc_refs_np, log=log)

    classes: dict = {}
    rows = []
    for j in range(len(seqs)):
        e_umi = decode(eng["umi"][j]) if eng["status"][j] == ACCEPT else ""
        c = classify(int(eng["status"][j]), int(eng["bc_idx"][j]),
                     int(eng["score"][j]), e_umi,
                     int(a_status[j]), int(a_bc[j]), int(a_score[j]),
                     a_umi[j])
        classes[c] = classes.get(c, 0) + 1
        if c != "ok" and len(rows) < 50:
            rows.append({"name": names[j], "cand": seqs[j], "class": c,
                         "engine": [int(eng["bc_idx"][j]),
                                    int(eng["score"][j]),
                                    int(eng["status"][j]), e_umi],
                         "arbiter": [int(a_bc[j]), int(a_score[j]),
                                     int(a_status[j]), a_umi[j]]})
    n = len(seqs)
    agree = classes.get("ok", 0)
    return {"mode": mode, "n_candidates": n, "n_whitelist": int(len(full)),
            "whitelist": wl_file, "n_dp_arbitrated": n_dp, "agree": agree,
            "agreement": round(agree / n, 6) if n else 1.0,
            "classes": classes, "divergences": rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", default=",".join(SAMPLES))
    ap.add_argument("--n-reads", type=int,
                    default=int(os.environ.get("NANORANGER_GOLDEN_READS",
                                               10**9)))
    ap.add_argument("--out", default=os.path.join(
        REPO, "tests", "goldens", "match_parity.json"))
    a = ap.parse_args()
    report = {"n_reads": a.n_reads, "whitelist": "737K-august-2016",
              "samples": {}}
    if os.path.isfile(a.out):
        # subset regens (e.g. --samples nuc_synthetic) keep the other
        # samples' checked-in results
        with open(a.out) as f:
            prev = json.load(f)
        if prev.get("n_reads") == a.n_reads:
            report["samples"].update(prev.get("samples", {}))
    for sample in a.samples.split(","):
        rep = run_sample(sample, a.n_reads)
        report["samples"][sample] = rep
        print(f"  {sample}: {rep['agree']}/{rep['n_candidates']} agree "
              f"({rep['classes']})", flush=True)
        with open(a.out, "w") as f:      # checkpoint after each sample
            json.dump(report, f, indent=1)
    print("wrote", a.out)


if __name__ == "__main__":
    main()
