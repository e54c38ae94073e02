"""Fused CLI decon step: the streamed pipeline's hot path in ONE program.

The streamed CLI previously ran four device programs per batch
(seed_and_chain → _chain_summaries → extend_scores×rounds → _scan_flanks)
with host work and device→host syncs between them. On a remote-compile /
tunneled TPU each extra program costs ~10-25 s of one-time compile and
each sync costs a round trip, which made the user-facing pipeline ~100×
slower than the fused bench step (BENCH_r02: 142.9 vs 18,337 reads/s).

This module fuses the whole per-batch computation — seed → chain DP →
EXACT chain-record extraction → base-level end extension → flank adapter
scan → BC-UMI slice → whitelist match — into one jitted step, and the
host only downloads small per-slot coordinate/result arrays from which it
assembles the byte-identical artifacts (subread fastq, BCUMI fasta, eds
rows, polyA, assignments).

Exactness contract (tested in tests/test_cli_fast_path.py): for every
read with at most S kept chains, outputs are byte-identical to the
unfused path (align.aligner.extract_records + ops.extend +
stages.decon.run_decon + stages.barcode match). Reads with more than S
kept chains are flagged (`defer`) and the caller reroutes just those
reads through the unfused path, so artifacts are identical for ALL reads.

Unlike the bench-oriented stages/device_step.py (top-S via anchor top_k —
approximate for multi-chain reads), record extraction here is exact:
anchors are re-sorted by chain root and per-chain summaries come from
segmented scans (no scatters — TPU scatters are slow and compile slowly),
reproducing _chain_summaries' per-root reductions and extract_records'
(score desc, root asc) greedy primary/supplementary selection bit for
bit (reference minimap2 --secondary=no + -Y semantics,
scripts/align_trns.sh:9).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..align.aligner import (MIN_CHAIN_CNT, MIN_CHAIN_SCORE,
                             prepare_index_arrays, seed_and_chain)
from ..align.index import PanelIndex
from ..align.minimizers import K
from ..chemistry import ChemistrySpec
from ..io.encode import COMPLEMENT, PAD, encode
from ..ops.extend import F_EXT, extend_scores

BIG = jnp.int32(1 << 30)
NEGF = jnp.float32(-1e18)


# ---------------------------------------------------------------------------
# exact device record extraction

def _records_exact(chain_out, lengths, ref_lens, S: int):
    """Per-read top-S chains with EXACT extract_records semantics.

    Returns dict of (B, S) arrays in EMISSION order (root ascending — the
    order extract_records returns records, = gidx order): ok (emitted),
    flag (0/16/2048/2064), strand, qstart/qend (original-read coords,
    pre-extension), tstart/tend, ref_id, score; plus (B,) n_chains and
    defer (= read has more kept chains than S slots).
    """
    t, qpos, seg = chain_out["t"], chain_out["qpos"], chain_out["seg"]
    valid, f, root = chain_out["valid"], chain_out["f"], chain_out["root"]
    B, A = t.shape

    # group anchors by chain root (per read): one 1-key sort carrying the
    # reduction payloads; invalid anchors sink to the tail
    key = jnp.where(valid & (root >= 0), root, BIG)
    rs, qp_s, t_s, f_s, sg_s = jax.lax.sort(
        (key, qpos.astype(jnp.int32), t, f, seg),
        dimension=1, num_keys=1, is_stable=False)

    # segmented reductions via one associative scan (combiner: reset at
    # root boundaries). Replaces _chain_summaries' scatter min/max/add.
    ones = jnp.ones((B, A), jnp.int32)

    def comb(a, b):
        same = a[0] == b[0]

        def m(op, x, y):
            return jnp.where(same, op(x, y), y)

        return (b[0],
                m(jnp.maximum, a[1], b[1]),     # fmax
                m(jnp.minimum, a[2], b[2]),     # qlo
                m(jnp.maximum, a[3], b[3]),     # qhi
                m(jnp.minimum, a[4], b[4]),     # tlo
                m(jnp.maximum, a[5], b[5]),     # thi
                m(jnp.add, a[6], b[6]))         # cnt

    _, fmax, qlo, qhi, tlo, thi, cnt = jax.lax.associative_scan(
        comb, (rs, f_s, qp_s, qp_s, t_s, t_s, ones), axis=1)

    is_end = jnp.concatenate(
        [rs[:, 1:] != rs[:, :-1], jnp.ones((B, 1), bool)], axis=1)
    keep = is_end & (rs < BIG) & (cnt >= MIN_CHAIN_CNT) & \
        (fmax >= MIN_CHAIN_SCORE)
    n_chains = jnp.sum(keep, axis=1).astype(jnp.int32)

    # top-S selection in extract_records order: score desc, ties root asc
    # (np.lexsort((-score, read_idx)) is stable with gidx==root order).
    # S sequential two-level argmax picks — cheap to compile vs a wide
    # multi-operand sort.
    taken = ~keep
    f_sel = jnp.where(keep, fmax, NEGF)
    slots = {k: jnp.zeros((B, S), jnp.int32)
             for k in ("root", "qstart", "qend", "tstart", "thi", "seg")}
    slots["score"] = jnp.zeros((B, S), jnp.float32)
    slot_ok = jnp.zeros((B, S), bool)
    for s in range(S):
        fm = jnp.where(taken, NEGF, f_sel)
        m1 = jnp.max(fm, axis=1, keepdims=True)
        cand = ~taken & (fm == m1)
        r2 = jnp.where(cand, rs, BIG)
        m2 = jnp.min(r2, axis=1, keepdims=True)
        pick = cand & (r2 == m2)                      # exactly one column
        any_pick = jnp.any(pick, axis=1)
        idx = jnp.argmax(pick, axis=1)[:, None]

        def g(a):
            return jnp.take_along_axis(a, idx, axis=1)[:, 0]

        slots["root"] = slots["root"].at[:, s].set(g(rs))
        slots["score"] = slots["score"].at[:, s].set(g(fmax))
        slots["qstart"] = slots["qstart"].at[:, s].set(g(qlo))
        slots["qend"] = slots["qend"].at[:, s].set(g(qhi) + K)
        slots["tstart"] = slots["tstart"].at[:, s].set(g(tlo))
        slots["thi"] = slots["thi"].at[:, s].set(g(thi))
        slots["seg"] = slots["seg"].at[:, s].set(g(sg_s))
        slot_ok = slot_ok.at[:, s].set(any_pick)
        taken = taken | pick

    strand = jnp.where(slot_ok, slots["seg"] & 1, 0)
    ref_id = jnp.where(slot_ok, slots["seg"] >> 1, 0)
    qstart = jnp.where(slot_ok, slots["qstart"], 0)
    qend = jnp.where(slot_ok, slots["qend"], 0)
    tstart = jnp.where(slot_ok, slots["tstart"], 0)
    tend = jnp.where(
        slot_ok, jnp.minimum(slots["thi"] + K, ref_lens[ref_id]), 0)

    # greedy primary/supplementary selection by query overlap, in slot
    # (= score) order — extract_records' loop: first kept is primary,
    # later chains kept as supplementary iff max overlap with any KEPT
    # chain < MASK_LEVEL(=0.5) * span (exact as 2*ov < span in ints)
    kept = jnp.zeros((B, S), bool)
    flag = jnp.zeros((B, S), jnp.int32)
    for s in range(S):
        ov = jnp.zeros((B,), jnp.int32)
        for s2 in range(s):
            lo = jnp.maximum(qstart[:, s], qstart[:, s2])
            hi = jnp.minimum(qend[:, s], qend[:, s2])
            ov = jnp.maximum(ov, jnp.where(kept[:, s2], hi - lo, 0))
        span = qend[:, s] - qstart[:, s]
        first = ~jnp.any(kept[:, :s], axis=1) if s else \
            jnp.ones((B,), bool)
        keep_s = slot_ok[:, s] & (first | (2 * ov < span))
        kept = kept.at[:, s].set(keep_s)
        flag = flag.at[:, s].set(
            jnp.where(first, 0, 2048) + 16 * strand[:, s])

    # reorder slots into emission (root asc) order — extract_records
    # returns records in gidx (= root) order, not score order
    emit_key = jnp.where(kept, slots["root"], BIG)
    (_, flag, strand, qstart, qend, tstart, tend, ref_id, score,
     ok_i) = jax.lax.sort(
        (emit_key, flag, strand, qstart, qend, tstart, tend, ref_id,
         slots["score"], kept.astype(jnp.int32)),
        dimension=1, num_keys=1, is_stable=True)

    # defer: more kept chains than slots, or anchor-capacity overflow in
    # the seed stage (truncated anchors would make the result depend on
    # the length bucket; the caller recomputes at canonical full width)
    defer = n_chains > S
    if "overflow" in chain_out:
        defer = defer | chain_out["overflow"]
    return {"ok": ok_i.astype(bool), "flag": flag, "strand": strand,
            "qstart": qstart, "qend": qend, "tstart": tstart, "tend": tend,
            "ref_id": ref_id, "score": score,
            "n_chains": n_chains, "defer": defer}


# ---------------------------------------------------------------------------
# fused base-level end extension (ops/extend.extend_records_host on device)

def _extend_slots(codes, lengths, rec, ref_flat, ref_off, ref_lens,
                  S: int, rounds: int = 4, F: int = F_EXT):
    """Extend slot spans in stored-read orientation — the exact math of
    extend_records_host (same extend_scores DP, same cap-gated re-rounds),
    vectorized over the B*S slots inside the fused program."""
    B = codes.shape[0]
    L = codes.shape[1]
    R = B * S
    read_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
    rlen = lengths[read_idx]
    strand = rec["strand"].reshape(R)
    ok = rec["ok"].reshape(R)
    rid = rec["ref_id"].reshape(R)
    roff = ref_off[rid]
    rl = ref_lens[rid]

    s_qs = jnp.where(strand == 1, rlen - rec["qend"].reshape(R),
                     rec["qstart"].reshape(R))
    s_qe = jnp.where(strand == 1, rlen - rec["qstart"].reshape(R),
                     rec["qend"].reshape(R))
    ts = rec["tstart"].reshape(R)
    te = rec["tend"].reshape(R)

    comp = jnp.asarray(COMPLEMENT)
    jj = jnp.arange(F, dtype=jnp.int32)[None, :]

    def stored_gather(x):
        """stored-orientation base at positions x (R, F); -1 pad handled
        by callers via explicit lengths."""
        xc = jnp.clip(x, 0, L - 1)
        pos = jnp.where(strand[:, None] == 1, rlen[:, None] - 1 - xc, xc)
        v = codes[read_idx[:, None], jnp.clip(pos, 0, L - 1)]
        return jnp.where(strand[:, None] == 1, comp[v], v)

    def ref_gather(y):
        yc = jnp.clip(roff[:, None] + jnp.maximum(y, 0), 0,
                      ref_flat.shape[0] - 1)
        return ref_flat[yc]

    def one_round(state):
        s_qs, s_qe, ts, te, active = state
        lo_qn = jnp.minimum(s_qs, F)
        lo_tn = jnp.minimum(ts, F)
        hi_qn = jnp.clip(rlen - s_qe, 0, F)
        hi_tn = jnp.clip(rl - te, 0, F)
        q_lo = jnp.where(jj < lo_qn[:, None],
                         stored_gather(s_qs[:, None] - 1 - jj), -1)
        t_lo = jnp.where(jj < lo_tn[:, None],
                         ref_gather(ts[:, None] - 1 - jj), -1)
        q_hi = jnp.where(jj < hi_qn[:, None],
                         stored_gather(s_qe[:, None] + jj), -1)
        t_hi = jnp.where(jj < hi_tn[:, None],
                         ref_gather(te[:, None] + jj), -1)
        qf = jnp.concatenate([q_lo, q_hi], axis=0).astype(jnp.int8)
        tf = jnp.concatenate([t_lo, t_hi], axis=0).astype(jnp.int8)
        qn = jnp.concatenate([lo_qn, hi_qn]).astype(jnp.int32)
        tn = jnp.concatenate([lo_tn, hi_tn]).astype(jnp.int32)
        bi, bj = extend_scores(qf, qn, tf, tn, F=F)
        qi_l, qi_r = bi[:R], bi[R:]
        tj_l, tj_r = bj[:R], bj[R:]
        upd = active
        s_qs = jnp.where(upd, s_qs - qi_l, s_qs)
        s_qe = jnp.where(upd, s_qe + qi_r, s_qe)
        ts = jnp.where(upd, ts - tj_l, ts)
        te = jnp.where(upd, te + tj_r, te)
        capped = ((qi_l >= F - 4) | (tj_l >= F - 4) |
                  (qi_r >= F - 4) | (tj_r >= F - 4)) & \
            ((qi_l + qi_r + tj_l + tj_r) > 0)
        return s_qs, s_qe, ts, te, active & capped

    state = (s_qs, s_qe, ts, te, ok)
    state = one_round(state)            # round 1: all kept slots
    for _ in range(rounds - 1):
        # later rounds matter only for ends that consumed a whole flank
        # (rare anchor-drift cases) — skip the work when none are active,
        # exactly reproducing extend_records_host's shrinking active set
        state = jax.lax.cond(jnp.any(state[4]),
                             one_round, lambda st: st, state)
    s_qs, s_qe, ts, te, _ = state

    qstart = jnp.where(strand == 1, rlen - s_qe, s_qs)
    qend = jnp.where(strand == 1, rlen - s_qs, s_qe)
    return {"qstart": qstart.reshape(B, S), "qend": qend.reshape(B, S),
            "tstart": ts.reshape(B, S), "tend": te.reshape(B, S)}


# ---------------------------------------------------------------------------

def build_cli_step(spec: ChemistrySpec, index: PanelIndex, matcher=None,
                   S: int = 4, Lc: int = 96):
    """One jitted per-batch program for the streamed pipeline.

    Returns (step, tables): step(codes (B, L) int8, lengths (B,) int32,
    tables) → dict of flat (B*S,) arrays (emission order: read-major,
    chain-root ascending) plus (B,) n_chains/defer. `tables` is the
    device-resident pytree of index/whitelist arrays — passed as an
    ARGUMENT (not closure constants) so the compiled executable stays
    small, AOT-cacheable, and reusable across whitelists of equal shape.
    The host assembles artifacts via assemble_batch(); reads with
    defer=True are recomputed on the unfused path by the caller.
    """
    ps, pc, planes = prepare_index_arrays(index)
    tables = {
        "prefix_start": ps, "prefix_count": pc, "planes": planes,
        "ref_lens": jnp.asarray(index.ref_lens.astype(np.int32)),
        "ref_flat": jnp.asarray(
            np.concatenate([np.asarray(s, np.int8)
                            for s in index.seq_codes])
            if index.n_refs else np.zeros(1, np.int8)),
        "ref_off": jnp.asarray(index.ref_offset.astype(np.int32)),
    }
    if matcher is not None and spec.barcode is not None:
        tables["m"] = matcher.device_tables()

    f = spec.flank
    scan = spec.scan
    sub = spec.subread
    rule = spec.bcumi_rule
    pat_bytes = encode(scan.pattern).tobytes() if scan else b""
    do_match = matcher is not None and spec.barcode is not None
    umi_len = spec.barcode.umi_len if spec.barcode else 0

    from .decon import _anchor_code, _scan_flanks

    @jax.jit
    def step(codes, lengths, t):
        B, L = codes.shape
        m = max(64, ((L // 4) + 63) // 64 * 64)
        chain_out = seed_and_chain(codes, lengths, t["prefix_start"],
                                   t["prefix_count"], t["planes"],
                                   max_minimizers=m)
        rec = _records_exact(chain_out, lengths, t["ref_lens"], S)
        ext = _extend_slots(codes, lengths, rec, t["ref_flat"],
                            t["ref_off"], t["ref_lens"], S)
        R = B * S
        read_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
        ok = rec["ok"].reshape(R)
        strand = rec["strand"].reshape(R)
        flag = rec["flag"].reshape(R)
        ref_id = rec["ref_id"].reshape(R)
        qstart = ext["qstart"].reshape(R)
        qend = ext["qend"].reshape(R)
        tstart = ext["tstart"].reshape(R)
        tend = ext["tend"].reshape(R)
        rlen = lengths[read_idx]
        s_qstart = jnp.where(strand == 1, rlen - qend, qstart)
        s_qend = jnp.where(strand == 1, rlen - qstart, qend)
        qlen = s_qend - s_qstart

        out = {"ok": ok, "flag": flag, "strand": strand, "ref_id": ref_id,
               "qstart": qstart, "qend": qend,
               "n_chains": rec["n_chains"], "defer": rec["defer"]}

        # ---- adapter scan (stages/decon._scan_flanks, same jitted body)
        if scan is not None:
            window, wlen, wstart, ed, gs, ge = _scan_flanks(
                codes, lengths, read_idx, strand, qstart, qend,
                anchor=_anchor_code(f.anchor), lo=f.lo, hi=f.hi,
                pattern=pat_bytes, k=scan.k, wildcard=scan.n_wildcard,
                pick_last=scan.pick_last, wsize=scan.window_size,
                stride=scan.window_stride, plus_one=scan.windows_plus_one)
            Wmax = f.hi - f.lo
            hit = ok & (ed >= 0) & (ed < scan.max_ed_exclusive)
        else:
            wlen = wstart = jnp.zeros(R, jnp.int32)
            ed = gs = ge = jnp.full(R, -1, jnp.int32)
            hit = jnp.zeros(R, bool)
            window = None
            Wmax = 0

        # ---- subread slice + accepts (stages/decon.run_decon math)
        sa = s_qstart if sub.start_anchor == "qstart" else s_qend
        ea = s_qstart if sub.end_anchor == "qstart" else s_qend
        sub_strt = sa + sub.start_ofs
        if spec.name == "5p10XTCR":     # utils.py:245-248
            sub_strt = jnp.where(qlen > -sub.start_ofs, sub_strt, s_qstart)
        if sub.start_clamp0:
            sub_strt = jnp.maximum(sub_strt, 0)
        sub_end = ea + sub.end_ofs
        if sub.end_clamp_len:
            sub_end = jnp.minimum(sub_end, rlen)
        sub_len = jnp.maximum(sub_end - sub_strt, 0)
        accept_sub = (sub_len > sub.min_len) if sub.min_len else \
            jnp.ones(R, bool)
        if spec.subread_requires == "clip40":       # RTX utils.py:78,83
            accept_sub &= (sub_end - s_qend) > 40
        elif spec.subread_requires == "span400":    # utils.py:405-407,429
            accept_sub &= (tend - tstart) > 400
        elif spec.subread_requires == "qlen100":    # utils.py:350
            accept_sub &= qlen > 100
        if spec.requires_adapter_for_subread or spec.name == "3p10XTCR":
            accept_sub &= hit
        accept_sub &= ok

        # ---- bcumi slice within the flank window
        bgs = jnp.where(hit, gs, 0)
        bge = jnp.where(hit, ge, 0)
        if rule == "slice":
            b_lo, b_hi, do_rev, post = bgs, bge, False, 0
        elif rule == "rev_slice14":
            b_lo, b_hi, do_rev, post = bgs, bge, True, 14
        elif rule == "rev_slideseq":
            b_lo, b_hi, do_rev, post = jnp.maximum(bgs - 22, 0), \
                bge + 16, True, 0
        elif rule == "rev_nuc":
            bad = bgs < 35
            b_lo = jnp.where(bad, 0, bgs - 35)
            b_hi = jnp.where(bad, 0, bge - 12)
            do_rev, post = True, 0
        elif rule == "rev_3pgex":
            bad = bgs < 32
            b_lo = jnp.where(bad, 0, bgs - 32)
            b_hi = jnp.where(bad, 0, bgs + 3)
            do_rev, post = True, 0
        else:
            b_lo = b_hi = jnp.zeros(R, jnp.int32)
            do_rev, post = False, 0
        b_hi = jnp.minimum(b_hi, wlen)
        b_lo = jnp.clip(b_lo, 0, None)
        b_len = jnp.maximum(b_hi - b_lo, 0)

        accept_bc = hit
        if spec.name in ("3pXCR_slideseq", "3p10XTCR", "3p10XTCR_nuc",
                         "3p10XGEX"):
            accept_bc &= accept_sub
        accept_pre = accept_bc       # pre-length-filter (raw counts / eds)
        if spec.bcumi_min_len:
            accept_bc &= (b_len - post) > spec.bcumi_min_len
        if rule == "rev_slideseq":
            # post filter: len>45 and (polyA<70 or (polyA>70 and
            # A-frac>0.5)) — the reference REJECTS a polyA of exactly 70
            # (utils.py:468-474); A-frac>0.5 as 2*count > len in ints
            pa_len = jnp.minimum(jnp.maximum(b_lo + 5, 0), wlen)
            jw = jnp.arange(Wmax, dtype=jnp.int32)[None, :]
            a_cnt = jnp.sum(((window == 0) &
                             (jw < pa_len[:, None])).astype(jnp.int32),
                            axis=1)
            acc = (b_len > 45) & ((pa_len < 70) |
                                  ((pa_len > 70) & (2 * a_cnt > pa_len)))
            accept_bc &= acc
            out["pa_len"] = pa_len

        out.update(hit=hit, ed=ed, gs=gs, ge=ge, wstart=wstart, wlen=wlen,
                   sub_strt=sub_strt, sub_end=sub_end,
                   accept_sub=accept_sub, accept_bc=accept_bc,
                   accept_pre=accept_pre, b_lo=b_lo, b_hi=b_hi)

        # ---- whitelist match on the sliced candidates
        if do_match:
            jc = jnp.arange(Lc, dtype=jnp.int32)[None, :]
            eff_len = jnp.maximum(b_len - post, 0)
            blen = jnp.where(accept_bc, jnp.clip(eff_len, 0, Lc), 0)
            comp = jnp.asarray(COMPLEMENT)
            if do_rev:
                src = b_hi[:, None] - 1 - (jc + post)
                vals = comp[jnp.take_along_axis(
                    window, jnp.clip(src, 0, Wmax - 1), axis=1)]
            else:
                src = b_lo[:, None] + jc
                vals = jnp.take_along_axis(
                    window, jnp.clip(src, 0, Wmax - 1), axis=1)
            cand = jnp.where(jc < blen[:, None], vals, PAD).astype(jnp.int8)

            # compact candidates to the front: real libraries average
            # <1 adapter hit/read (K562 ~0.73, TCR3 ~0.52, slideseq
            # ~0.36), so a budget of one hit per READ (M = B = R/S)
            # covers every observed batch; the conditional spill pass
            # below matches the overflow exactly on concatemer-rich
            # batches. Halving the old R/2 budget cuts ~20 ms/batch of
            # padded-row match work on the chip (profile_step.py) with
            # bit-identical results.
            M = R // S
            sort_key = jnp.where(accept_bc, 0, 1).astype(jnp.int32)
            _, perm = jax.lax.sort(
                (sort_key, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
            sel = perm[:M]
            spill = perm[M:]
            # dp=False: tier passes resolve ~85-95% of candidates in-
            # stream; rows needing the exhaustive one-vs-all DP come
            # back DP_PENDING and the pipeline matches them post-hoc in
            # ONE batched sweep (pipeline.match_barcodes) — the fused
            # step never stalls on the one-vs-all kernel.
            bc_m, score_m, status_m, umi_m, _ = matcher.match_device_with(
                cand[sel], blen[sel], t["m"], dp=False)
            n_spill = jnp.sum(accept_bc[spill])

            def run_spill(_):
                b, s, st, u, _q = matcher.match_device_with(
                    cand[spill], blen[spill], t["m"], dp=False)
                return b, s, st, u

            def no_spill(_):
                return (jnp.full((R - M,), -1, jnp.int32),
                        jnp.full((R - M,), -(1 << 20), jnp.int32),
                        jnp.full((R - M,), 5, jnp.int32),
                        jnp.full((R - M, umi_m.shape[1]), PAD, umi_m.dtype))

            bc_s, score_s, status_s, umi_s = jax.lax.cond(
                n_spill > 0, run_spill, no_spill, operand=None)

            # un-permute results with ONE sort (keys = original row index)
            # instead of scatter merges — TPU scatters run and compile
            # slowly. UMI rows pack 3 bits/code into int32 lanes of 8
            # codes each (x64 is disabled, so no int64) and ride the same
            # sort as extra payloads.
            n_lanes = (umi_len + 7) // 8

            def pack_umi(u):
                u32 = u.astype(jnp.int32)
                lanes = []
                for ln in range(n_lanes):
                    v = jnp.zeros(u.shape[0], jnp.int32)
                    for j in range(ln * 8, min((ln + 1) * 8, umi_len)):
                        v = v | (u32[:, j] << (3 * (j - ln * 8)))
                    lanes.append(v)
                return lanes

            lanes_m = pack_umi(umi_m)
            lanes_s = pack_umi(umi_s)
            sorted_ = jax.lax.sort(
                (perm,
                 jnp.concatenate([bc_m, bc_s]),
                 jnp.concatenate([score_m, score_s]),
                 jnp.concatenate([status_m, status_s]),
                 *[jnp.concatenate([lm, ls])
                   for lm, ls in zip(lanes_m, lanes_s)]),
                dimension=0, num_keys=1, is_stable=False)
            out["bc_idx"] = sorted_[1]
            out["score"] = sorted_[2]
            out["status"] = sorted_[3]
            cols = []
            for ln in range(n_lanes):
                lane = sorted_[4 + ln]
                w = min((ln + 1) * 8, umi_len) - ln * 8
                jc8 = jnp.arange(w, dtype=jnp.int32)[None, :]
                cols.append(((lane[:, None] >> (3 * jc8)) & 7)
                            .astype(jnp.int8))
            out["umi"] = jnp.concatenate(cols, axis=1)
        return out

    return step, tables

# ---------------------------------------------------------------------------
# host-side artifact assembly

_CODE_TO_ASCII = np.frombuffer(b"ACGTN.", dtype=np.uint8).copy()
_RC_TABLE = bytes.maketrans(b"ACGTN.", b"TGCAN.")


class BatchAssembly:
    """Host products of one fused batch — the fields DeconResult carries,
    plus per-candidate match results (match_* rows align with bcumi_*;
    match_bc < -1 marks rows from deferred reads, matched later)."""

    __slots__ = ("sub_names", "sub_seqs", "sub_quals", "bcumi_names",
                 "bcumi_seqs", "eds_rows", "raw_bc_counts", "polyA",
                 "match_bc", "match_score", "match_status", "match_umi",
                 "n_deferred_reads", "raw_keys", "read_bounds")

    def __init__(self):
        self.sub_names = []
        self.sub_seqs = []
        self.sub_quals = []
        self.bcumi_names = []
        self.bcumi_seqs = []
        self.eds_rows = []
        self.raw_bc_counts = {}
        self.polyA = []
        self.match_bc = []
        self.match_score = []
        self.match_status = []
        self.match_umi = []
        self.n_deferred_reads = 0
        # per-read chunking for out-of-order (length-bucketed) dispatch:
        # raw_keys mirrors raw_bc_counts increments in emission order;
        # read_bounds[i] = cumulative (n_sub, n_bc, n_eds, n_polyA, n_raw)
        # after batch row i, so row i's artifacts are the slices between
        # read_bounds[i-1] and read_bounds[i]
        self.raw_keys = []
        self.read_bounds = []


def assemble_batch(spec: ChemistrySpec, out: dict, codes, lengths, names,
                   quals, ref_names, sample, slow_fallback=None
                   ) -> BatchAssembly:
    """Build the per-batch artifacts from fused-step outputs.

    `out` is the downloaded (numpy) step output. Reads flagged defer
    (more kept chains than device slots) are recomputed through
    `slow_fallback(read_indices) -> DeconResult-like` and interleaved in
    read order, so the artifact byte-stream is identical to the unfused
    path for every read.
    """
    B, L = codes.shape
    S = out["flag"].shape[0] // B
    res = BatchAssembly()
    emit = out["ok"]
    defer = out["defer"]
    any_defer = bool(defer.any())

    # vectorized ASCII views of the batch (forward + complement); stored-
    # orientation slices come out of these without per-row decode calls
    fwd = _CODE_TO_ASCII[codes.astype(np.uint8) % 6]
    lengths = np.asarray(lengths)

    rc_cache: dict = {}

    def stored_bytes(i: int, strand: int) -> bytes:
        n = int(lengths[i])
        if strand == 0:
            return fwd[i, :n].tobytes()
        s = rc_cache.get(i)
        if s is None:
            s = fwd[i, :n].tobytes().translate(_RC_TABLE)[::-1]
            rc_cache[i] = s
        return s

    def stored_qual(i: int, strand: int) -> bytes:
        n = int(lengths[i])
        q = quals[i][:n]
        return q[::-1] if strand else q

    flag = out["flag"]
    strand = out["strand"]
    ref_id = out["ref_id"]
    qstart = out["qstart"]
    qend = out["qend"]
    sub_strt = out["sub_strt"]
    sub_end = out["sub_end"]
    accept_sub = out["accept_sub"]
    accept_bc = out["accept_bc"]
    accept_pre = out["accept_pre"]
    hit = out["hit"]
    ed = out["ed"]
    gs = out["gs"]
    wstart = out["wstart"]
    wlen = out["wlen"]
    b_lo = out["b_lo"]
    b_hi = out["b_hi"]
    ge = out["ge"]
    rule = spec.bcumi_rule
    do_rev = rule in ("rev_slice14", "rev_slideseq", "rev_nuc", "rev_3pgex")
    post = 14 if rule == "rev_slice14" else 0
    do_match = "bc_idx" in out

    def fmt_name(r: int, i: int) -> str:
        trans = ref_names[ref_id[r]]
        if spec.name == "RTX":
            trans = trans.split("|")[0]                     # utils.py:61
        elif spec.name in ("3p10XTCR", "3p10XTCR_nuc"):
            trans = trans.split("-")[0]                     # utils.py:324,1005
        fl = int(flag[r])
        if spec.name_format.startswith("{rname10}"):        # 3p10XTCR
            ql = int(qend[r]) - int(qstart[r])
            return (f"{names[i][-10:]}_q{ql}_d{int(ed[r])}"
                    f"_s{int(sub_strt[r])}_e{int(sub_end[r])}_f{fl}_{trans}")
        if "{sample}" in spec.name_format:                  # slideseq / nuc
            return (f"{names[i]}_{sample}_{int(sub_strt[r])}"
                    f"_{int(sub_end[r])}_{fl}_{trans}")
        return (f"{names[i]}_{int(qstart[r])}_{int(qend[r])}_{fl}_{trans}")

    def bcumi_str(r: int, i: int, st: int) -> str:
        lo = int(wstart[r]) + int(b_lo[r])
        hi = int(wstart[r]) + int(b_hi[r])
        sb = stored_bytes(i, st)[lo:hi]
        if do_rev:
            sb = sb.translate(_RC_TABLE)[::-1]
        return sb[post:].decode("ascii") if post else sb.decode("ascii")

    # deferred reads: recomputed through the unfused path by the caller,
    # grouped per read — slow_fallback(didx) returns
    # {global_read_idx: {"sub": [(name, seq, qual)...], "bc": [(name,
    # seq)...], "eds": [...], "polyA": [...], "raw": [key...]}}
    slow_by_read: dict = {}
    if any_defer:
        didx = np.where(defer)[0]
        res.n_deferred_reads = len(didx)
        slow_by_read = slow_fallback(didx)

    def _one_read(i):
        if lengths[i] == 0:
            return
        if defer[i]:
            g = slow_by_read.get(i)
            if not g:
                return
            for nm, sq, ql in g["sub"]:
                res.sub_names.append(nm)
                res.sub_seqs.append(sq)
                res.sub_quals.append(ql)
            for key in g["raw"]:
                res.raw_bc_counts[key] = res.raw_bc_counts.get(key, 0) + 1
                res.raw_keys.append(key)
            for nm, sq in g["bc"]:
                res.bcumi_names.append(nm)
                res.bcumi_seqs.append(sq)
                res.match_bc.append(-2)       # matched later by the caller
                res.match_score.append(0)
                res.match_status.append(0)
                res.match_umi.append(None)
            res.eds_rows.extend(g["eds"])
            res.polyA.extend(g["polyA"])
            return
        for s in range(S):
            r = i * S + s
            if not emit[r]:
                continue
            st = int(strand[r])
            if accept_sub[r]:
                res.sub_names.append(fmt_name(r, i))
                lo, hi = int(sub_strt[r]), int(sub_end[r])
                n = int(lengths[i])
                lo, hi = max(lo, 0), min(hi, n)
                if hi <= lo:
                    res.sub_seqs.append("")
                    res.sub_quals.append("")
                else:
                    res.sub_seqs.append(
                        stored_bytes(i, st)[lo:hi].decode("ascii"))
                    res.sub_quals.append(
                        stored_qual(i, st)[lo:hi].decode("ascii"))
            if spec.name == "3p10XGEX" and accept_pre[r]:
                key = bcumi_str(r, i, st)[3:3 + 16]         # utils.py:1376
                res.raw_bc_counts[key] = res.raw_bc_counts.get(key, 0) + 1
                res.raw_keys.append(key)
            if accept_bc[r]:
                s_str = bcumi_str(r, i, st)
                nm = fmt_name(r, i)
                res.bcumi_names.append(nm)
                res.bcumi_seqs.append(s_str)
                if do_match:
                    res.match_bc.append(int(out["bc_idx"][r]))
                    res.match_score.append(int(out["score"][r]))
                    res.match_status.append(int(out["status"][r]))
                    res.match_umi.append(out["umi"][r])
                if rule == "rev_slideseq":
                    pa_hi = int(wstart[r]) + int(
                        min(max(int(b_lo[r]) + 5, 0), int(wlen[r])))
                    res.polyA.append(
                        (nm, stored_bytes(i, st)[int(wstart[r]):pa_hi]
                         .decode("ascii")))
            # mode-specific eds rows (run_decon order: flat record order)
            if spec.name == "5p10XTCR" and hit[r]:
                n = int(lengths[i])
                s_qs = (n - int(qend[r])) if st else int(qstart[r])
                lclip = -spec.flank.lo
                start_corr = (lclip - int(gs[r])) if s_qs > lclip \
                    else (s_qs - int(gs[r]))
                res.eds_rows.append(
                    [start_corr, ref_names[ref_id[r]],
                     int(ge[r]) - int(gs[r]), int(ed[r])])
            elif spec.name == "3p10XTCR":
                res.eds_rows.append(int(ed[r]))
            elif spec.name == "3pXCR_slideseq" and accept_pre[r]:
                res.eds_rows.append((">" + fmt_name(r, i), int(ed[r])))

    for i in range(B):
        _one_read(i)
        res.read_bounds.append((len(res.sub_names), len(res.bcumi_names),
                                len(res.eds_rows), len(res.polyA),
                                len(res.raw_keys)))
    return res
