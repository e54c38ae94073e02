"""Barcode matching stage: seed screen → exact rescoring → unique-best
acceptance → UMI extraction.

Replaces the reference's STAR sub-stack (write_bc_* → barcode_ref.sh →
barcode_align.sh → process_matching_* SAM scan; SURVEY.md §3.5) with one
jitted device step.

Status codes per candidate (mirroring what the reference observes from
STAR's SAM output):
  0 ACCEPT    — unique best, AS >= as_min, UMI intact (read contributes to
                read_bcumi_dic, utils.py:718)
  1 LOW_AS    — aligned best < as_min (present in all_AS histogram only)
  2 MULTIMAP  — score tie across different barcodes (STAR
                outFilterMultimapScoreRange 0 drop; never reaches the SAM)
  3 NO_CAND   — no seed hit at all (STAR unmapped)
  4 BAD_UMI   — accepted barcode but UMI column unaligned or truncated
                (reference umi='N' / len<umi_len → bad_bc, utils.py:710-716)
  6 RC_BEST   — the reverse-complement alignment outscores every forward
                one: STAR (which searches both strands,
                scripts/barcode_align.sh:14-35) would report it with flag
                16, and the reference's `read.flag == 0` gate rejects it
                AND drops it from the flag-0 score histogram
                (utils.py:699,728-735). A forward/reverse score TIE is two
                best alignments → outFilterMultimapNmax 1 drops the read
                entirely (MULTIMAP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..chemistry import BarcodeMatchSpec
from ..io import whitelist as wl
from ..io.encode import COMPLEMENT, PAD, encode_batch
from ..ops.seed_screen import SeedTable, plan_for, screen
from ..ops.sw import NEG, sw_end2end

ACCEPT, LOW_AS, MULTIMAP, NO_CAND, BAD_UMI = 0, 1, 2, 3, 4
RC_BEST = 6


def _best_score_only(q, qlen, cand, refs, rlen_scalar, umi_ref_offset,
                     pad_left, full_len):
    """Max exact score over the candidate set (reverse-strand pass needs
    only the best score, not UMI/runner bookkeeping)."""
    B, K = cand.shape
    has = cand >= 0
    ref_pairs = refs[jnp.clip(cand, 0, refs.shape[0] - 1)].reshape(B * K, -1)
    score, _, _ = sw_end2end(jnp.repeat(q, K, axis=0), jnp.repeat(qlen, K),
                             ref_pairs,
                             jnp.full((B * K,), rlen_scalar, jnp.int32),
                             umi_ref_offset, pad_left=pad_left,
                             full_len=full_len)
    return jnp.max(jnp.where(has, score.reshape(B, K), NEG), axis=1)


def _apply_rc(status, best_score, rc_best, umi):
    """STAR both-strand semantics: rc strictly better → flag-16 row the
    reference rejects (RC_BEST); tie → two best loci → multimap drop."""
    status = jnp.where(rc_best > best_score, RC_BEST, status)
    status = jnp.where((rc_best == best_score) & (rc_best > NEG),
                       MULTIMAP, status)
    umi = jnp.where((status == ACCEPT)[:, None], umi, PAD)
    return status, umi


def pack_window_keys(q, bc_len: int):
    """2-bit keys of every bc_len-window of each row: (B, W) uint32 +
    validity (no N/PAD inside the window). bc_len <= 16."""
    B, Lq = q.shape
    W = Lq - bc_len + 1
    c = q.astype(jnp.uint32)
    ok = (q >= 0) & (q < 4)
    keys = jnp.zeros((B, W), jnp.uint32)
    allok = jnp.ones((B, W), bool)
    for t in range(bc_len):
        keys = (keys << 2) | c[:, t:t + W]
        allok = allok & ok[:, t:t + W]
    return keys, allok


def exact_window_hits(q, qlen, keys_sorted, idx_sorted, bc_len: int,
                      max_pre: int, max_suf: int):
    """All EXACT whitelist bc_len-mers inside each candidate, at any
    position the N-pads can absorb — i.e. every score-16 (= bc_len)
    end-to-end alignment. STAR aligns the whole candidate against the
    whole padded row, so a second perfect barcode ANYWHERE in the
    candidate is a second best locus (outFilterMultimapNmax 1 ⇒ drop);
    the jittered product screen only looks near the nominal offset and
    cannot see these (match_parity.py round-4 finding).

    A score of bc_len requires the exact contiguous barcode with its
    flanking query chars absorbed by the N pads: window start i <=
    max_pre and tail <= max_suf (extra chars would be -1 insertions).

    Returns (n_distinct, ebc, eqpos): how many DISTINCT barcodes hit
    (sharded callers SUM these across disjoint whitelist shards), the
    smallest hitting barcode id (-1 when none; it is THE barcode when
    n_distinct == 1), and the query position after its LAST occurrence
    (the kernels' largest-on-path qpos tie rule).

    idx_sorted entries < 0 mark padding rows (sharded whitelists pad to
    equal size); their windows never count."""
    B, Lq = q.shape
    W = Lq - bc_len + 1
    keys, allok = pack_window_keys(q, bc_len)
    i_arr = jnp.arange(W, dtype=jnp.int32)[None, :]
    tail = qlen[:, None] - (i_arr + bc_len)
    feas = (i_arr <= max_pre) & (tail >= 0) & (tail <= max_suf)
    pos = jnp.searchsorted(keys_sorted, keys.reshape(-1)).reshape(B, W)
    pos_c = jnp.clip(pos, 0, keys_sorted.shape[0] - 1)
    found = allok & feas & (keys_sorted[pos_c] == keys) & \
        (idx_sorted[pos_c] >= 0)
    BIG = jnp.int32(1 << 30)
    hit_bc = jnp.where(found, idx_sorted[pos_c], BIG)
    sorted_bc = jax.lax.sort(hit_bc, dimension=1)
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32),
                            sorted_bc[:, :-1]], axis=1)
    n_distinct = jnp.sum((sorted_bc != prev) & (sorted_bc < BIG),
                         axis=1).astype(jnp.int32)
    any_ = n_distinct >= 1
    ebc = jnp.where(any_, sorted_bc[:, 0], -1)
    last_i = jnp.max(jnp.where(found & (hit_bc == ebc[:, None]), i_arr, -1),
                     axis=1)
    eqpos = jnp.where(any_, last_i + bc_len, -1)
    return n_distinct, ebc, eqpos


def exact_window_any(q, qlen, keys_sorted, bc_len: int, max_pre: int,
                     max_suf: int, idx_sorted=None):
    """Reverse-strand variant: only existence matters (an exact rc
    structure equals the max attainable rc score). idx_sorted (optional)
    marks padding rows with negative entries — sharded whitelists pad
    with sentinel keys that must never count."""
    B, Lq = q.shape
    W = Lq - bc_len + 1
    keys, allok = pack_window_keys(q, bc_len)
    i_arr = jnp.arange(W, dtype=jnp.int32)[None, :]
    tail = qlen[:, None] - (i_arr + bc_len)
    feas = (i_arr <= max_pre) & (tail >= 0) & (tail <= max_suf)
    pos = jnp.searchsorted(keys_sorted, keys.reshape(-1)).reshape(B, W)
    pos_c = jnp.clip(pos, 0, keys_sorted.shape[0] - 1)
    found = allok & feas & (keys_sorted[pos_c] == keys)
    if idx_sorted is not None:
        found = found & (idx_sorted[pos_c] >= 0)
    return jnp.any(found, axis=1)


def apply_exact(bc, score, status, umi, q, qlen, eany, emulti, ebc, eqpos,
                bc_len: int, umi_len: int):
    """Merge exact-window results into the screened verdicts: a unique
    exact barcode overrides any lower-scoring screened result; a second
    distinct score-16 locus (exact-exact or exact-vs-screened) is a STAR
    multimap drop."""
    s16 = jnp.int32(bc_len)
    tie = emulti | (eany & (score == s16) & (bc != ebc))
    better = eany & (score < s16)
    score = jnp.where(eany, s16, score)
    bc = jnp.where(better, ebc, bc)
    Lq = q.shape[1]
    off = jnp.arange(umi_len, dtype=jnp.int32)[None, :]
    uidx = jnp.clip(eqpos[:, None] + off, 0, Lq - 1)
    umi_e = jnp.take_along_axis(q, uidx, axis=1)
    u_ok = (eqpos >= 0) & (eqpos + umi_len <= qlen)
    status = jnp.where(better, jnp.where(u_ok, ACCEPT, BAD_UMI), status)
    umi = jnp.where(better[:, None], umi_e, umi)
    status = jnp.where(tie, MULTIMAP, status)
    umi = jnp.where((status == ACCEPT)[:, None], umi, PAD)
    return bc, score, status, umi


def screen_jitters(spec: BarcodeMatchSpec, floor: int = 8):
    """Offset jitters that make the profile screens cover EVERY N-pad-
    feasible start position, not just the neighborhood of the nominal
    offset: a score >= as_min alignment can sit anywhere in
    [0, pad_left] (forward) / [0, pad_right] (reverse) — round-4
    match_parity showed accepted-vs-multimap flips from 14/15-scoring
    loci outside the old +-8 window. Symmetric jitter with the
    out-of-range offsets masked by the screens' own bounds checks."""
    fwd = max(floor, spec.bc_query_offset,
              spec.pad_left - spec.bc_query_offset)
    rc = max(floor, spec.rc_query_offset,
             spec.pad_right - spec.rc_query_offset)
    return fwd, rc


def rc_half_layout(spec: BarcodeMatchSpec):
    """Seed-half layout of the REVCOMP'd barcode structure (the bc, or
    bc8+linker+bc6 for slideseq — revcomp'd structure = rc(bc6) + rc(linker)
    + rc(bc8), so the exact-seed halves are its two bead-barcode parts)."""
    if spec.slideseq_linker:
        s_len = spec.umi_ref_offset - spec.pad_left          # 32
        return s_len, ((0, 6), (s_len - 8, s_len)), (0, s_len - 8)
    return spec.bc_len, ((0, 8), (8, 16)), (0, 8)


@functools.partial(jax.jit,
                   static_argnames=("nominal", "jitter", "q_delta2", "l1",
                                    "l2", "c_rc", "wide_hi",
                                    "pad_left", "full_len"))
def _rc_best_product(q, qlen, refs_rc, rlen_scalar, planes1, planes2, pair,
                     nominal, jitter, q_delta2, l1, l2, c_rc, wide_hi=None,
                     pad_left=None, full_len=None):
    from ..ops.product_screen import (product_screen,
                                      product_screen_joint)
    cand, _ = product_screen(q, qlen, planes1, planes2, pair, nominal,
                             jitter, q_delta2, l1, l2, top_t=8, top_k=8)
    if wide_hi is not None:
        # wide-offset joint pass: >= as_min rc alignments anywhere the N
        # pads allow (ties with the forward best multimap-drop the read)
        wbc, _ = product_screen_joint(q, qlen, planes1, planes2, pair,
                                      0, wide_hi, q_delta2, l1, l2)
        cand = jnp.concatenate([cand, wbc], axis=1)
    return _best_score_only(q, qlen, cand, refs_rc, rlen_scalar, c_rc,
                            pad_left, full_len)


@functools.partial(jax.jit,
                   static_argnames=("plan", "c_rc", "top_k", "maxocc",
                                    "pad_left", "full_len"))
def _rc_best_bucket(q, qlen, refs_rc, rlen_scalar,
                    starts0, counts0, entries0, hkeys0,
                    starts1, counts1, entries1, hkeys1,
                    plan, c_rc, top_k, maxocc,
                    pad_left=None, full_len=None):
    cand, _ = screen(q, qlen, starts0, counts0, entries0, hkeys0,
                     starts1, counts1, entries1, hkeys1, plan, top_k,
                     maxocc)
    return _best_score_only(q, qlen, cand, refs_rc, rlen_scalar, c_rc,
                            pad_left, full_len)


def _select_from_candidates(q, qlen, cand, refs, rlen_scalar,
                            umi_ref_offset, umi_len, as_min, top_k,
                            pad_left=None, full_len=None):
    """Shared post-screen path: exact rescoring, unique-best acceptance,
    UMI extraction (used by both screen variants and the sharded matcher).
    With pad_left/full_len set (TPU), refs holds only the band columns
    [pad_left, umi_ref_offset] and the exact banded kernel runs — 5x less
    gather traffic and sequential DP (ops/sw.sw_end2end)."""
    B, Lq = q.shape
    K = top_k
    has_cand = cand >= 0
    cand_cl = jnp.clip(cand, 0, refs.shape[0] - 1)
    ref_pairs = refs[cand_cl].reshape(B * K, -1)
    q_pairs = jnp.repeat(q, K, axis=0)
    qlen_pairs = jnp.repeat(qlen, K)
    rlen_pairs = jnp.full((B * K,), rlen_scalar, jnp.int32)
    score, qpos, uvalid = sw_end2end(q_pairs, qlen_pairs, ref_pairs,
                                     rlen_pairs, umi_ref_offset,
                                     pad_left=pad_left, full_len=full_len)
    score = jnp.where(has_cand.reshape(-1), score, NEG).reshape(B, K)
    qpos = qpos.reshape(B, K)
    uvalid = uvalid.reshape(B, K)

    best_k = jnp.argmax(score, axis=1)
    best_score = jnp.take_along_axis(score, best_k[:, None], axis=1)[:, 0]
    best_bc = jnp.take_along_axis(cand, best_k[:, None], axis=1)[:, 0]
    # runner-up among DIFFERENT barcodes (duplicate candidates of the same
    # barcode must not look like multimapping)
    other = (cand != best_bc[:, None]) & has_cand
    runner = jnp.max(jnp.where(other, score, NEG), axis=1)

    any_cand = jnp.any(has_cand, axis=1)
    multimap = any_cand & (runner == best_score) & (best_score > NEG)
    low = any_cand & ~multimap & (best_score < as_min)

    bqpos = jnp.take_along_axis(qpos, best_k[:, None], axis=1)[:, 0]
    buvalid = jnp.take_along_axis(uvalid, best_k[:, None], axis=1)[:, 0]
    umi_ok = buvalid & (bqpos + umi_len <= qlen) & (bqpos >= 0)

    status = jnp.full((B,), NO_CAND, jnp.int32)
    status = jnp.where(any_cand, LOW_AS, status)
    status = jnp.where(any_cand & ~low & multimap, MULTIMAP, status)
    ok = any_cand & ~low & ~multimap
    status = jnp.where(ok & umi_ok, ACCEPT, jnp.where(ok, BAD_UMI, status))

    # UMI codes gather
    off = jnp.arange(umi_len, dtype=jnp.int32)[None, :]
    uidx = jnp.clip(bqpos[:, None] + off, 0, Lq - 1)
    umi = jnp.take_along_axis(q, uidx, axis=1)
    umi = jnp.where((status == ACCEPT)[:, None], umi, PAD)
    return best_bc, best_score, status, umi, bqpos


@functools.partial(jax.jit,
                   static_argnames=("plan", "umi_ref_offset", "umi_len",
                                    "as_min", "top_k", "maxocc", "pad_left",
                                    "full_len"))
def _match_jit(q, qlen, refs, rlen_scalar,
               starts0, counts0, entries0, hkeys0,
               starts1, counts1, entries1, hkeys1,
               plan, umi_ref_offset, umi_len, as_min, top_k, maxocc,
               pad_left=None, full_len=None):
    """Bucket-screen variant (general whitelists)."""
    cand, _ = screen(q, qlen, starts0, counts0, entries0, hkeys0,
                     starts1, counts1, entries1, hkeys1, plan, top_k,
                     maxocc)
    bc, score, status, umi, qpos = _select_from_candidates(
        q, qlen, cand, refs, rlen_scalar, umi_ref_offset, umi_len, as_min,
        top_k, pad_left, full_len)
    return bc, score, status, umi, qpos


@functools.partial(jax.jit,
                   static_argnames=("nominal", "jitter", "q_delta2", "l1",
                                    "l2", "umi_ref_offset", "umi_len",
                                    "as_min", "top_k", "wide_hi",
                                    "pad_left", "full_len"))
def _match_jit_product(q, qlen, refs, rlen_scalar, planes1, planes2, pair,
                       nominal, jitter, q_delta2, l1, l2,
                       umi_ref_offset, umi_len, as_min, top_k,
                       wide_hi=None, pad_left=None, full_len=None):
    """Product-screen variant (10x-style combinatorial whitelists —
    ops/product_screen.py)."""
    from ..ops.product_screen import product_screen, product_screen_joint
    # indel-damaged halves rank low in ungapped profiles, so rescore a
    # wider candidate set and let the exact DP arbitrate
    cand, _ = product_screen(q, qlen, planes1, planes2, pair, nominal,
                             jitter, q_delta2, l1, l2,
                             top_t=max(top_k, 8), top_k=max(2 * top_k, 16))
    K = max(2 * top_k, 16)
    if wide_hi is not None:
        # wide-offset joint pass: near-perfect loci far from the nominal
        # offset (the per-side top-T cannot rank them — see
        # product_screen_joint)
        wbc, _ = product_screen_joint(q, qlen, planes1, planes2, pair,
                                      0, wide_hi, q_delta2, l1, l2)
        cand = jnp.concatenate([cand, wbc], axis=1)
        K = K + wbc.shape[1]
    return _select_from_candidates(
        q, qlen, cand, refs, rlen_scalar, umi_ref_offset, umi_len, as_min,
        K, pad_left, full_len)


class BarcodeMatcher:
    """Holds device-resident whitelist tables for one chemistry."""

    def __init__(self, barcodes: np.ndarray, spec: BarcodeMatchSpec,
                 jitter: int = 8, top_k: int = 8, force_bucket: bool = False,
                 rc_pass: bool = True):
        import threading

        from ..ops.product_screen import ProductTable
        self._aot_fn = None
        self._aot_shape = None
        self._aot_lock = threading.Lock()
        self.spec = spec
        self.barcodes = np.asarray(barcodes)
        bc_codes, _ = encode_batch([b for b in self.barcodes],
                                   max_len=spec.bc_len)
        refs_np, ref_len = wl.padded_refs(self.barcodes, spec)
        self.ref_len = int(ref_len)
        self.refs = jnp.asarray(refs_np)
        # band columns [pad_left, umi_ref_offset] for the TPU banded
        # rescorer (the N pads outside have closed-form DP — ops/sw)
        self.refs_band = jnp.asarray(
            refs_np[:, spec.pad_left:spec.umi_ref_offset + 1])
        self.plan = plan_for(spec, spec.bc_query_offset, jitter)
        self.fwd_jitter, self.rc_jitter = screen_jitters(spec, jitter)
        self.top_k = top_k
        self.jitter = jitter
        self.product = None if force_bucket else ProductTable.build(
            bc_codes.astype(np.int64), self.plan.half_bounds,
            self.plan.q_deltas)
        if self.product is not None:
            self._planes1 = jnp.asarray(self.product.planes1)
            self._planes2 = jnp.asarray(self.product.planes2)
            self._pair = jnp.asarray(self.product.pair)
            self._tables = None
            self.maxocc = 0
        else:
            t = SeedTable(bc_codes.astype(np.int64), self.plan)
            self.maxocc = t.maxocc
            self._tables = tuple(jnp.asarray(a) for a in
                                 (t.starts[0], t.counts[0], t.entries[0],
                                  t.half_keys[0], t.starts[1], t.counts[1],
                                  t.entries[1], t.half_keys[1]))

        # ---- reverse-strand tables: score(q, rc(ref)) == score(rc(q), ref),
        # so the SAME query screens against the revcomp'd whitelist —
        # full-row revcomp of the padded refs (N pads swap sides) and a
        # screen table over the revcomp'd barcode structure at the mirrored
        # nominal offset (STAR searches both strands,
        # scripts/barcode_align.sh:14-35; reference accepts flag==0 only,
        # utils.py:699 — see RC_BEST above)
        # ---- exact-window tables: sorted 2-bit keys of the barcodes and
        # of their revcomps, for the whole-candidate exact score-16 pass
        # (exact_window_hits; not applicable to the 32-nt slideseq
        # structure — a 32-mer exceeds the 2-bit uint32 key and exact
        # full-structure collisions are not physically reachable there)
        self._ex_np = None
        if not spec.slideseq_linker and spec.bc_len <= 16:
            keys = np.zeros(len(self.barcodes), np.uint32)
            for t in range(spec.bc_len):
                keys = (keys << np.uint32(2)) | bc_codes[:, t].astype(np.uint32)
            order = np.argsort(keys, kind="stable")
            from ..io.encode import COMPLEMENT as _C
            rc_codes = _C[bc_codes][:, ::-1]
            rkeys = np.zeros(len(self.barcodes), np.uint32)
            for t in range(spec.bc_len):
                rkeys = (rkeys << np.uint32(2)) | rc_codes[:, t].astype(np.uint32)
            self._ex_np = (keys[order], order.astype(np.int32),
                           np.sort(rkeys))
            self._ex_dev = None

        self.rc_pass = rc_pass
        if rc_pass:
            from ..io.encode import COMPLEMENT as _C
            refs_rc_np = _C[refs_np][:, ::-1]
            s_len, rc_bounds, rc_deltas = rc_half_layout(spec)
            self.c_rc = spec.pad_right + s_len   # column after the rc struct
            self.refs_rc = jnp.asarray(refs_rc_np)
            self.refs_rc_band = jnp.asarray(
                refs_rc_np[:, spec.pad_right:self.c_rc + 1])
            struct_rc = refs_rc_np[:, spec.pad_right:spec.pad_right + s_len]
            self.rc_plan = type(self.plan)(s_len, rc_bounds, rc_deltas,
                                           spec.rc_query_offset, jitter)
            self.rc_product = None if force_bucket else ProductTable.build(
                struct_rc.astype(np.int64), rc_bounds, rc_deltas)
            if self.rc_product is not None:
                self._rc_planes1 = jnp.asarray(self.rc_product.planes1)
                self._rc_planes2 = jnp.asarray(self.rc_product.planes2)
                self._rc_pair = jnp.asarray(self.rc_product.pair)
                self._rc_tables = None
            else:
                t = SeedTable(struct_rc.astype(np.int64), self.rc_plan)
                self.rc_maxocc = t.maxocc
                self._rc_tables = tuple(jnp.asarray(a) for a in
                                        (t.starts[0], t.counts[0],
                                         t.entries[0], t.half_keys[0],
                                         t.starts[1], t.counts[1],
                                         t.entries[1], t.half_keys[1]))

    def device_tables(self):
        """The table arrays the jit-composable match consumes, as an
        explicit pytree — callers building large fused programs pass
        these as ARGUMENTS so the compiled executable stays table-free
        (constant-embedding bloats executables ~20x and makes cache keys
        content-dependent)."""
        import jax as _jax
        banded = _jax.default_backend() != "cpu"
        t = {"refs": self.refs_band if banded else self.refs}
        if self.product is not None:
            t.update(planes1=self._planes1, planes2=self._planes2,
                     pair=self._pair)
        else:
            t["tables"] = self._tables
        if self.rc_pass:
            t["rc_refs"] = self.refs_rc_band if banded else self.refs_rc
            if self.rc_product is not None:
                t.update(rc_planes1=self._rc_planes1,
                         rc_planes2=self._rc_planes2,
                         rc_pair=self._rc_pair)
            else:
                t["rc_tables"] = self._rc_tables
        if self._ex_np is not None:
            if self._ex_dev is None:
                self._ex_dev = tuple(jnp.asarray(a) for a in self._ex_np)
            t["ex_keys"], t["ex_idx"], t["rc_ex_keys"] = self._ex_dev
        return t

    def rc_best_with(self, q, qlen, t):
        """Best reverse-strand score per candidate from explicit tables."""
        import jax as _jax
        banded = _jax.default_backend() != "cpu"
        pad_left = self.spec.pad_right if banded else None
        full_len = self.ref_len if banded else None
        if self.rc_product is not None:
            p = self.rc_product
            return _rc_best_product(
                q, qlen, t["rc_refs"], jnp.int32(self.ref_len),
                t["rc_planes1"], t["rc_planes2"], t["rc_pair"],
                nominal=self.rc_plan.nominal, jitter=self.jitter,
                q_delta2=p.q_delta2, l1=p.l1, l2=p.l2, c_rc=self.c_rc,
                wide_hi=self.spec.pad_right,
                pad_left=pad_left, full_len=full_len)
        return _rc_best_bucket(
            q, qlen, t["rc_refs"], jnp.int32(self.ref_len),
            *t["rc_tables"], plan=self.rc_plan, c_rc=self.c_rc,
            top_k=self.top_k, maxocc=self.rc_maxocc, pad_left=pad_left,
            full_len=full_len)

    def match_device_with(self, q, qlen, t):
        """Jit-composable match from explicit tables (device_tables())."""
        import jax as _jax
        banded = _jax.default_backend() != "cpu"
        pad_left = self.spec.pad_left if banded else None
        full_len = self.ref_len if banded else None
        if self.product is not None:
            p = self.product
            bc, score, status, umi, qpos = _match_jit_product(
                q, qlen, t["refs"], jnp.int32(self.ref_len),
                t["planes1"], t["planes2"], t["pair"],
                nominal=self.plan.nominal, jitter=self.jitter,
                q_delta2=p.q_delta2, l1=p.l1, l2=p.l2,
                umi_ref_offset=self.spec.umi_ref_offset,
                umi_len=self.spec.umi_len, as_min=self.spec.as_min,
                top_k=self.top_k, wide_hi=self.spec.pad_left,
                pad_left=pad_left, full_len=full_len)
        else:
            bc, score, status, umi, qpos = _match_jit(
                q, qlen, t["refs"], jnp.int32(self.ref_len), *t["tables"],
                plan=self.plan, umi_ref_offset=self.spec.umi_ref_offset,
                umi_len=self.spec.umi_len, as_min=self.spec.as_min,
                top_k=self.top_k, maxocc=self.maxocc,
                pad_left=pad_left, full_len=full_len)
        if "ex_keys" in t:
            # whole-candidate exact pass: every score-16 locus at any
            # N-pad-feasible position (STAR sees the full row; the
            # jittered screen does not — see exact_window_hits)
            nd, ebc, eqpos = exact_window_hits(
                q, qlen, t["ex_keys"], t["ex_idx"], self.spec.bc_len,
                self.spec.pad_left, self.spec.pad_right)
            bc, score, status, umi = apply_exact(
                bc, score, status, umi, q, qlen, nd >= 1, nd >= 2, ebc,
                eqpos, self.spec.bc_len, self.spec.umi_len)
        if self.rc_pass:
            rc_best = self.rc_best_with(q, qlen, t)
            if "rc_ex_keys" in t:
                r_any = exact_window_any(
                    q, qlen, t["rc_ex_keys"], self.spec.bc_len,
                    self.spec.pad_right, self.spec.pad_left)
                rc_best = jnp.maximum(
                    rc_best, jnp.where(r_any, jnp.int32(self.spec.bc_len),
                                       NEG))
            status, umi = _apply_rc(status, score, rc_best, umi)
        return bc, score, status, umi, qpos

    def match_device(self, q, qlen):
        """Jit-composable match: returns (bc, score, status, umi, qpos)."""
        return self.match_device_with(q, qlen, self.device_tables())

    def enable_aot(self, batch: int, Lq: int, log=None):
        """AOT-cache the standalone match program for (batch, Lq) inputs
        (runtime/aot_cache.py): the standalone matcher otherwise pays a
        ~12 s remote compile per process — the last cold-start item after
        the fused-step executables are cached. Idempotent; thread-safe;
        no-op on CPU or with NANORANGER_AOT=0."""
        import os as _os

        import jax as _jax
        if (_jax.default_backend() == "cpu" or
                _os.environ.get("NANORANGER_AOT", "") == "0"):
            return
        with self._aot_lock:
            if self._aot_fn is not None and self._aot_shape == (batch, Lq):
                return
            from ..runtime.aot_cache import get_or_compile
            t = self.device_tables()

            @jax.jit
            def fn(q, qlen, tt):
                return self.match_device_with(q, qlen, tt)

            example = (np.zeros((batch, Lq), np.int8),
                       np.zeros(batch, np.int32), t)
            s = self.spec
            extra = (s.umi_ref_offset, s.umi_len, s.as_min, s.bc_len,
                     self.top_k, self.rc_pass, int(len(self.barcodes)),
                     self.ref_len)
            self._aot_fn = get_or_compile("match", fn, example, extra,
                                          log=log)
            self._aot_shape = (batch, Lq)
            self._aot_tables = t

    def match(self, q: np.ndarray, qlen: np.ndarray):
        """q: (B, Lq) int8 BC-UMI candidates; returns dict of numpy arrays."""
        if getattr(self, "_aot_fn", None) is not None and \
                q.shape == self._aot_shape:
            bc, score, status, umi, qpos = self._aot_fn(
                jnp.asarray(q), jnp.asarray(qlen), self._aot_tables)
        else:
            bc, score, status, umi, qpos = self.match_device(
                jnp.asarray(q), jnp.asarray(qlen))
        return {"bc_idx": np.asarray(bc), "score": np.asarray(score),
                "status": np.asarray(status), "umi": np.asarray(umi),
                "qpos": np.asarray(qpos)}

    def bc_strings(self, bc_idx: np.ndarray) -> np.ndarray:
        out = np.full(bc_idx.shape, "", dtype=object)
        ok = bc_idx >= 0
        out[ok] = self.barcodes[bc_idx[ok]]
        return out
