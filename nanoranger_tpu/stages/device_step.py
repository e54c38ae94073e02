"""Fully-jitted single-dispatch pipeline step: reads → barcode/UMI/gene.

This is the production fast path (and the bench/graft flagship): one XLA
computation fusing seed→chain→chain-extraction→flank-scan→BC-UMI slice→
whitelist match→counts, with no host round-trips. The streamed pipeline
(pipeline.py) uses the host chain extractor for full record fidelity
(supplementary flags, BAM emission); this step keeps everything on device
with top-S chains per read.

Device chain extraction: parent pointers from the chain DP are resolved to
chain roots by pointer doubling; per-root scores via scatter-max; top-S
roots become alignment slots with masked span reductions; greedy query-
overlap suppression (mask level 0.5) mirrors minimap2 primary selection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..align.aligner import (MIN_CHAIN_CNT, MIN_CHAIN_SCORE, seed_and_chain)
from ..align.index import PanelIndex
from ..align.minimizers import K
from ..chemistry import ChemistrySpec
from ..io.encode import COMPLEMENT, PAD, encode
from ..stages.barcode import ACCEPT, BarcodeMatcher

MASK_LEVEL = 0.5


def _device_records(chain_out, lengths, S: int):
    """Top-S chains per read as fixed slots.

    Chain labels come straight from the DP's root propagation; top chains
    are selected by taking the top anchors by f (a chain's end anchor
    carries its maximal score) and greedily keeping distinct roots — no
    scatter or pointer-chasing on device.

    Returns dict of (B, S): ok, strand, qstart, qend (original-read coords),
    tstart, tend (ref-local t), ref_id."""
    t, q, qpos = chain_out["t"], chain_out["q"], chain_out["qpos"]
    seg, valid = chain_out["seg"], chain_out["valid"]
    strand = chain_out["strand"]
    f, root = chain_out["f"], chain_out["root"]
    B, A = t.shape

    fv = jnp.where(valid & (root >= 0), f, -jnp.inf)
    T = max(16, 4 * S)
    cand_f, cand_i = jax.lax.top_k(fv, T)                  # (B, T)
    cand_root = jnp.take_along_axis(root, cand_i, axis=1)
    used = ~jnp.isfinite(cand_f)
    chosen_root = jnp.full((B, S), -2, jnp.int32)
    chosen_f = jnp.full((B, S), -jnp.inf)
    for s in range(S):
        avail = ~used
        any_avail = jnp.any(avail, axis=1)
        pick = jnp.argmax(avail, axis=1)[:, None]
        r_s = jnp.take_along_axis(cand_root, pick, axis=1)[:, 0]
        f_s = jnp.take_along_axis(cand_f, pick, axis=1)[:, 0]
        chosen_root = chosen_root.at[:, s].set(
            jnp.where(any_avail, r_s, -2 - s))
        chosen_f = chosen_f.at[:, s].set(
            jnp.where(any_avail, f_s, -jnp.inf))
        used = used | (cand_root == jnp.where(any_avail, r_s, -99)[:, None])
    top_f = chosen_f

    out = {"score": top_f}
    member = root[:, None, :] == chosen_root[:, :, None]   # (B, S, A)
    member = member & valid[:, None, :] & (chosen_root[:, :, None] >= 0)
    n_member = jnp.sum(member, axis=2)
    qpos_l = jnp.where(member, qpos[:, None, :], 1 << 30)
    qpos_h = jnp.where(member, qpos[:, None, :] + K, -1)
    t_l = jnp.where(member, t[:, None, :], 1 << 30)
    t_h = jnp.where(member, t[:, None, :] + K, -1)
    qstart = jnp.min(qpos_l, axis=2)
    qend = jnp.max(qpos_h, axis=2)
    tstart = jnp.min(t_l, axis=2)
    tend = jnp.max(t_h, axis=2)
    st = jnp.max(jnp.where(member, strand[:, None, :], 0), axis=2)
    seg_m = jnp.max(jnp.where(member, seg[:, None, :], -1), axis=2)
    ok = jnp.isfinite(top_f) & (top_f >= MIN_CHAIN_SCORE) & \
        (n_member >= MIN_CHAIN_CNT)

    # greedy primary/supplementary suppression by query overlap
    keep = jnp.ones((B, S), bool)
    for s in range(1, S):
        ov = jnp.zeros((B,), jnp.int32)
        for s2 in range(s):
            lo = jnp.maximum(qstart[:, s], qstart[:, s2])
            hi = jnp.minimum(qend[:, s], qend[:, s2])
            ov = jnp.maximum(ov, jnp.where(keep[:, s2], hi - lo, 0))
        span = jnp.maximum(qend[:, s] - qstart[:, s], 1)
        keep = keep.at[:, s].set(ov < (MASK_LEVEL * span).astype(jnp.int32))
    ok = ok & keep

    ref_id = jnp.maximum(seg_m, 0) >> 1
    out.update(ok=ok, strand=st, qstart=qstart, qend=qend,
               tstart=tstart, tend=tend, ref_id=ref_id)
    return out


def build_device_step(spec: ChemistrySpec, index: PanelIndex,
                      matcher: BarcodeMatcher, S: int = 2,
                      max_minimizers: int = 128):
    """Single-chip jitted step for the 10x chemistries (5' 'slice' rules
    and the 3' reverse rules 'rev_slice14'/'rev_nuc'/'rev_3pgex'; slideseq
    stays on the streamed path — its polyA post-filter is host-side).

    Returns step(codes (B, L) int8, lengths (B,) int32) →
      dict(bc_idx (B,S), status, score, umi (B,S,umi_len), rec_ok, ref_id,
      counts (N_bc,), n_deferred). counts = accepted reads/barcode
      (psum-able); ref_id enables host-side (gene, bc, umi) quads."""
    rule = spec.bcumi_rule
    assert rule in ("slice", "rev_slice14", "rev_nuc", "rev_3pgex"), \
        f"device step does not cover bcumi_rule {rule!r}"
    from ..align.aligner import prepare_index_arrays
    from .decon import _anchor_code, _scan_flanks
    idx_arrays = prepare_index_arrays(index)
    f = spec.flank
    pat_bytes = encode(spec.scan.pattern).tobytes()
    n_bc = len(matcher.barcodes)
    Lc = 96
    gate_3p = spec.name in ("3pXCR_slideseq", "3p10XTCR", "3p10XTCR_nuc",
                            "3p10XGEX")

    umi_len = spec.barcode.umi_len

    def scan_and_match(codes, lengths, read_idx, strand, qstart, qend, ok):
        """Flank scan → BC-UMI slice → whitelist match for one row set.
        Row count is whatever the caller compacted to; returns
        (hit, bc, score, status, umi) for those rows."""
        Rr = read_idx.shape[0]
        rlen = lengths[read_idx]
        window, wlen, wstart, ed, gs, ge = _scan_flanks(
            codes, lengths, read_idx, strand, qstart, qend,
            anchor=_anchor_code(f.anchor), lo=f.lo, hi=f.hi,
            pattern=pat_bytes, k=spec.scan.k,
            wildcard=spec.scan.n_wildcard, pick_last=spec.scan.pick_last,
            wsize=spec.scan.window_size, stride=spec.scan.window_stride,
            plus_one=spec.scan.windows_plus_one)
        Wmax = f.hi - f.lo
        hit = (ed >= 0) & (ed < spec.scan.max_ed_exclusive) & ok

        # per-mode subread gate (3' modes emit BC-UMI only when the
        # subread is accepted, stages/decon.py accept_bc &= accept_sub)
        s_qstart = jnp.where(strand == 1, rlen - qend, qstart)
        s_qend = jnp.where(strand == 1, rlen - qstart, qend)
        if gate_3p:
            sub = spec.subread
            sa = s_qstart if sub.start_anchor == "qstart" else s_qend
            ea = s_qstart if sub.end_anchor == "qstart" else s_qend
            sub_strt = sa + sub.start_ofs
            if sub.start_clamp0:
                sub_strt = jnp.maximum(sub_strt, 0)
            sub_end = ea + sub.end_ofs
            if sub.end_clamp_len:
                sub_end = jnp.minimum(sub_end, rlen)
            sub_len = jnp.maximum(sub_end - sub_strt, 0)
            acc_sub = sub_len > sub.min_len if sub.min_len else \
                jnp.ones((Rr,), bool)
            if spec.subread_requires == "qlen100":
                acc_sub = acc_sub & ((s_qend - s_qstart) > 100)
            hit = hit & acc_sub

        # BC-UMI slice per rule (same math as stages/decon.py)
        gs_ = jnp.where(hit, gs, 0)
        ge_ = jnp.where(hit, ge, 0)
        if rule == "slice":
            b_lo, b_hi, do_rev, post = gs_, ge_, False, 0
        elif rule == "rev_slice14":
            b_lo, b_hi, do_rev, post = gs_, ge_, True, 14
        elif rule == "rev_nuc":
            b_lo, b_hi, do_rev, post = gs_ - 35, ge_ - 12, True, 0
            hit = hit & (gs_ >= 35)            # python wraparound → reject
        else:                                   # rev_3pgex
            b_lo, b_hi, do_rev, post = gs_ - 32, gs_ + 3, True, 0
            hit = hit & (gs_ >= 32)
        b_hi = jnp.minimum(b_hi, wlen)
        b_lo = jnp.clip(b_lo, 0, None)
        b_len = jnp.maximum(b_hi - b_lo, 0)
        eff_len = jnp.maximum(b_len - post, 0)
        if spec.bcumi_min_len:
            hit = hit & (eff_len > spec.bcumi_min_len)

        jj = jnp.arange(Lc, dtype=jnp.int32)[None, :]
        blen = jnp.where(hit, jnp.clip(eff_len, 0, Lc), 0)
        if do_rev:
            src = b_hi[:, None] - 1 - (jj + post)
            comp = jnp.asarray(COMPLEMENT)
            vals = comp[jnp.take_along_axis(
                window, jnp.clip(src, 0, Wmax - 1), axis=1)]
        else:
            src = b_lo[:, None] + jj
            vals = jnp.take_along_axis(window, jnp.clip(src, 0, Wmax - 1),
                                       axis=1)
        cand = jnp.where(jj < blen[:, None], vals, PAD)
        bc, score, status, umi, _ = matcher.match_device(
            cand.astype(jnp.int8), blen)
        return hit, bc, score, status, umi

    @jax.jit
    def step(codes, lengths):
        B, L = codes.shape
        chain_out = seed_and_chain(codes, lengths, *idx_arrays,
                                   max_minimizers=max_minimizers)
        rec = _device_records(chain_out, lengths, S)
        R = B * S
        read_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
        strand = rec["strand"].reshape(R)
        qstart = rec["qstart"].reshape(R)
        qend = rec["qend"].reshape(R)
        ok = rec["ok"].reshape(R)

        # ok-slot compaction BEFORE the scan: most of the R = B*S slots
        # carry no chain (second slots are mostly empty) and the flank
        # scan + whitelist match dominate the step, so both run on a
        # fixed M = R/S = B budget (real libraries average ~1 chain and
        # <1 adapter hit per read). On chain-rich batches (concatemers,
        # README.md:21) a conditional SECOND pass covers the spilled
        # slots, so every slot is always processed — n_deferred is 0 by
        # construction and kept only as an invariant for callers.
        M = max(1, R // S)
        sort_key = jnp.where(ok, 0, 1).astype(jnp.int32)
        _, perm = jax.lax.sort(
            (sort_key, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
        sel = perm[:M]
        spill = perm[M:]
        hit_m, bc_m, score_m, status_m, umi_m = scan_and_match(
            codes, lengths, read_idx[sel], strand[sel], qstart[sel],
            qend[sel], ok[sel])
        n_spill = jnp.sum(ok[spill])
        R2 = R - M

        def run_spill(_):
            return scan_and_match(codes, lengths, read_idx[spill],
                                  strand[spill], qstart[spill],
                                  qend[spill], ok[spill])

        def no_spill(_):
            return (jnp.zeros((R2,), bool),
                    jnp.full((R2,), -1, jnp.int32),
                    jnp.full((R2,), -(1 << 20), jnp.int32),
                    jnp.full((R2,), 5, jnp.int32),
                    jnp.full((R2, umi_len), PAD, umi_m.dtype))

        hit_s, bc_s, score_s, status_s, umi_s = jax.lax.cond(
            n_spill > 0, run_spill, no_spill, operand=None)

        hit = jnp.zeros((R,), bool).at[sel].set(hit_m).at[spill].set(hit_s)
        bc_idx = jnp.full((R,), -1, jnp.int32).at[sel].set(bc_m) \
            .at[spill].set(bc_s)
        score = jnp.full((R,), -(1 << 20), jnp.int32).at[sel].set(score_m) \
            .at[spill].set(score_s)
        status = jnp.full((R,), 5, jnp.int32).at[sel].set(status_m) \
            .at[spill].set(status_s)
        umi = jnp.full((R, umi_m.shape[1]), PAD, umi_m.dtype) \
            .at[sel].set(umi_m).at[spill].set(umi_s)

        status = jnp.where(hit, status, 5)          # 5 = no adapter
        n_deferred = jnp.sum(ok) - jnp.sum(ok[sel]) - \
            jnp.where(n_spill > 0, jnp.sum(ok[spill]), 0)
        accepted = status == ACCEPT
        counts = jnp.zeros((n_bc,), jnp.int32).at[
            jnp.clip(bc_idx, 0, n_bc - 1)].add(accepted.astype(jnp.int32))
        return {"bc_idx": bc_idx.reshape(B, S),
                "status": status.reshape(B, S),
                "score": score.reshape(B, S),
                "umi": umi.reshape(B, S, -1),
                "rec_ok": ok.reshape(B, S),
                "ref_id": rec["ref_id"].reshape(B, S),
                "counts": counts,
                "n_deferred": n_deferred}

    return step
