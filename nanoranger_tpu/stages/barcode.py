"""Barcode matching stage: exact-structure tiers + exhaustive DP.

Replaces the reference's STAR sub-stack (write_bc_* → barcode_ref.sh →
barcode_align.sh → process_matching_* SAM scan; SURVEY.md §3.5) with one
jitted device step that is EXACT by construction:

  tier 16 (score = bc_len): an end-to-end score of bc_len requires the
      candidate to contain the barcode as an exact contiguous bc_len-mer
      at an N-pad-feasible position (every edit costs: +1 match columns
      only).  Sorted-key lookup of every window finds ALL of them.
  tier 15 (score = bc_len-1): uniquely a one-insertion structure
      (score = 2*matches - bc_len - insertions ⇒ bc_len-1 forces
      matches = bc_len, ins = 1).  Enumerating every (bc_len+1)-window
      with one interior char deleted finds ALL of them.
  DP tail: every candidate with neither structure on either strand is
      scored exhaustively against the FULL whitelist, forward and
      reverse, by ops/whitelist_verify (one-vs-all flipped DP) — best
      score, smallest best index, and tie count are exact.

This is the STAR semantics itself, not an approximation: ties at the
best score (any score) drop the read (--outFilterMultimapNmax 1 /
--outFilterMultimapScoreRange 0), a better reverse-strand alignment
yields a flag-16 row the reference rejects (utils.py:699), and the
accepted barcode/UMI come from the unique best alignment.  Round 4's
screened matcher agreed with the exhaustive arbiter on only ~94% of
candidates (tests/goldens/match_parity.json); this design agrees by
construction, with tools/match_parity.py validating the implementation
against an independent per-pair scorer.

Status codes per candidate (what the reference observes from STAR's SAM):
  0 ACCEPT    — unique best, AS >= as_min, UMI intact (utils.py:718)
  1 LOW_AS    — unique best below as_min (score histogram only)
  2 MULTIMAP  — score tie across barcodes/strands (never reaches the SAM)
  3 NO_CAND   — empty candidate (never aligned)
  4 BAD_UMI   — accepted barcode but UMI column unaligned or truncated
  6 RC_BEST   — reverse-strand alignment strictly outscores every forward
                one (flag-16 row, rejected by the reference's flag==0)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..chemistry import BarcodeMatchSpec
from ..io import whitelist as wl
from ..io.encode import COMPLEMENT, PAD, encode_batch
from ..ops.sw import NEG, sw_end2end
from ..ops.whitelist_verify import verify_all, verify_all_xla

ACCEPT, LOW_AS, MULTIMAP, NO_CAND, BAD_UMI = 0, 1, 2, 3, 4
RC_BEST = 6


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


def _lookup(keys, keys_sorted):
    pos = jnp.searchsorted(keys_sorted, keys.reshape(-1)).reshape(keys.shape)
    pos_c = jnp.clip(pos, 0, keys_sorted.shape[0] - 1)
    return pos_c, keys_sorted[pos_c] == keys


def _distinct_smallest_last(found, hit_bc, end_pos):
    """Across a row's hit set: (#distinct barcodes, smallest hitting
    barcode id or -1, largest end_pos among hits of that barcode)."""
    B = found.shape[0]
    BIGV = jnp.int32(1 << 30)
    ids = jnp.where(found, hit_bc, BIGV)
    sorted_bc = jax.lax.sort(ids, dimension=1)
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32),
                            sorted_bc[:, :-1]], axis=1)
    n_distinct = jnp.sum((sorted_bc != prev) & (sorted_bc < BIGV),
                         axis=1).astype(jnp.int32)
    any_ = n_distinct >= 1
    ebc = jnp.where(any_, sorted_bc[:, 0], -1)
    last = jnp.max(jnp.where(found & (hit_bc == ebc[:, None]), end_pos, -1),
                   axis=1)
    return n_distinct, ebc, jnp.where(any_, last, -1)


def exact_window_hits(q, qlen, keys_sorted, idx_sorted, bc_len: int,
                      max_pre: int, max_suf: int):
    """All EXACT whitelist bc_len-mers inside each candidate at any
    N-pad-feasible position — i.e. every score-bc_len end-to-end
    alignment (STAR aligns the whole candidate against the whole padded
    row; a second perfect barcode ANYWHERE is a second best locus).

    Returns (n_distinct, ebc, eqpos): how many DISTINCT barcodes hit
    (sharded callers SUM these across disjoint whitelist shards), the
    smallest hitting barcode id (-1 when none), and the query position
    after its LAST occurrence (the kernels' largest-on-path qpos rule).

    idx_sorted entries < 0 mark padding rows (sharded whitelists pad to
    equal size); their windows never count."""
    B, Lq = q.shape
    W = Lq - bc_len + 1
    keys, allok = pack_window_keys(q, bc_len)
    i_arr = jnp.arange(W, dtype=jnp.int32)[None, :]
    tail = qlen[:, None] - (i_arr + bc_len)
    feas = (i_arr <= max_pre) & (tail >= 0) & (tail <= max_suf)
    pos_c, eq = _lookup(keys, keys_sorted)
    found = allok & feas & eq & (idx_sorted[pos_c] >= 0)
    hit_bc = jnp.where(found, idx_sorted[pos_c], 1 << 30)
    nd, ebc, last_i = _distinct_smallest_last(found, hit_bc, i_arr)
    return nd, ebc, jnp.where(last_i >= 0, last_i + bc_len, -1)


def exact_window_any(q, qlen, keys_sorted, bc_len: int, max_pre: int,
                     max_suf: int, idx_sorted=None):
    """Reverse-strand tier-16: only existence matters (an exact rc
    structure equals the max attainable rc score)."""
    B, Lq = q.shape
    W = Lq - bc_len + 1
    keys, allok = pack_window_keys(q, bc_len)
    i_arr = jnp.arange(W, dtype=jnp.int32)[None, :]
    tail = qlen[:, None] - (i_arr + bc_len)
    feas = (i_arr <= max_pre) & (tail >= 0) & (tail <= max_suf)
    pos_c, eq = _lookup(keys, keys_sorted)
    found = allok & feas & eq
    if idx_sorted is not None:
        found = found & (idx_sorted[pos_c] >= 0)
    return jnp.any(found, axis=1)


def _ins1_keys(q, qlen, bc_len: int, max_pre: int, max_suf: int):
    """Keys of every one-insertion structure: windows of bc_len+1 chars
    starting at i with ONE interior char (window offset d in 1..bc_len-1)
    deleted.  Returns (keys (B, W1, D) uint32, found-mask precursor
    (B, W1, D) validity*feasibility, end_pos (B, W1) = i + bc_len + 1).

    Deleting the first/last window char reduces to the contiguous
    exact-16 case, so only interior deletions are enumerated.  The
    deleted (inserted) char may be anything including N; the bc_len kept
    chars must be real bases."""
    B, Lq = q.shape
    W1 = Lq - bc_len                      # (bc_len+1)-windows
    D = bc_len - 1
    c = jnp.where((q >= 0) & (q < 4), q, 0).astype(jnp.uint32)
    real = (q >= 0) & (q < 4)
    # run_ok[p, k] = all real in q[p:p+k] via cumsum of real
    cs = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                          jnp.cumsum(real.astype(jnp.int32), axis=1)],
                         axis=1)

    def ok_range(p0, length):
        # p0: (B, W1) start indices; all q[p0 : p0+length] real
        a = jnp.take_along_axis(cs, p0, axis=1)
        b = jnp.take_along_axis(cs, jnp.minimum(p0 + length, Lq), axis=1)
        return (b - a) == length

    # full-window packing at every start (length bc_len, MSB-first); pad
    # so suffix windows near the row end exist, and pack CLEANED codes
    # (N/PAD -> 0) — raw codes >= 4 overflow their 2-bit field into the
    # neighbouring char's bits.  Garbage windows are rejected by the
    # ok_range validity below, never by key value.
    qpad = jnp.pad(jnp.where(real, q, 0), ((0, 0), (0, bc_len)),
                   constant_values=0).astype(q.dtype)
    keys16, _ = pack_window_keys(qpad, bc_len)   # (B, Lq+1)
    i_arr = jnp.arange(W1, dtype=jnp.int32)[None, :]

    keys = []
    valid = []
    pre = jnp.zeros((B, W1), jnp.uint32)
    pre_ok = jnp.ones((B, W1), bool)
    for d in range(1, bc_len):
        # prefix q[i : i+d]  (d chars)
        pre = (pre << 2) | c[:, d - 1:d - 1 + W1]
        pre_ok = pre_ok & real[:, d - 1:d - 1 + W1]
        # suffix q[i+d+1 : i+bc_len+1]  (bc_len - d chars) = prefix of the
        # exact window starting at i+d+1
        sfull = keys16[:, d + 1:d + 1 + W1]
        suf = sfull >> jnp.uint32(2 * d)
        suf_ok = ok_range(i_arr + d + 1, bc_len - d)
        keys.append((pre << jnp.uint32(2 * (bc_len - d))) | suf)
        valid.append(pre_ok & suf_ok)
    keys = jnp.stack(keys, axis=2)               # (B, W1, D)
    valid = jnp.stack(valid, axis=2)
    tail = qlen[:, None] - (i_arr + bc_len + 1)
    feas = ((i_arr <= max_pre) & (tail >= 0) & (tail <= max_suf))[:, :, None]
    return keys, valid & feas, i_arr + bc_len + 1


def ins1_window_hits(q, qlen, keys_sorted, idx_sorted, bc_len: int,
                     max_pre: int, max_suf: int):
    """All score-(bc_len-1) one-insertion structures (see _ins1_keys).
    Returns (n_distinct, ebc, eqpos) with the same conventions as
    exact_window_hits (eqpos = end of the matched span = i+bc_len+1)."""
    B = q.shape[0]
    keys, mask, end_pos = _ins1_keys(q, qlen, bc_len, max_pre, max_suf)
    sh = keys.shape
    pos_c, eq = _lookup(keys.reshape(B, -1),
                        keys_sorted)
    found = mask.reshape(B, -1) & eq & (idx_sorted[pos_c] >= 0)
    hit_bc = jnp.where(found, idx_sorted[pos_c], 1 << 30)
    ends = jnp.broadcast_to(end_pos[:, :, None], sh).reshape(B, -1)
    return _distinct_smallest_last(found, hit_bc, ends)


def ins1_window_any(q, qlen, keys_sorted, bc_len: int, max_pre: int,
                    max_suf: int, idx_sorted=None):
    B = q.shape[0]
    keys, mask, _ = _ins1_keys(q, qlen, bc_len, max_pre, max_suf)
    pos_c, eq = _lookup(keys.reshape(B, -1), keys_sorted)
    found = mask.reshape(B, -1) & eq
    if idx_sorted is not None:
        found = found & (idx_sorted[pos_c] >= 0)
    return jnp.any(found, axis=1)


def combine_verdicts(q, qlen, spec, core_len, tiers, dp):
    """The arbitration of the exhaustive arbiter (tools/match_parity.py):
    rc>fwd -> RC_BEST; rc==fwd or fwd ties -> MULTIMAP; fwd<as_min ->
    LOW_AS; else ACCEPT/BAD_UMI.  `tiers` is None or the GLOBAL
    (nd16, ebc16, eq16, nd15, ebc15, eq15, rc16, rc15); `dp` is
    (need_dp, fb, fidx, fties, rb, fqpos, fuval) with fidx global.
    Shared by the single-chip matcher and the sharded matcher (which
    merges shard-local tier/DP results over the 'wl' axis first)."""
    B, Lq = q.shape
    s = spec
    m = core_len
    nonempty = qlen > 0
    need_dp, fb, fidx, fties, rb, fqpos, fuval = dp

    status = jnp.full((B,), NO_CAND, jnp.int32)
    score = jnp.full((B,), NEG, jnp.int32)
    bc = jnp.full((B,), -1, jnp.int32)
    qpos = jnp.full((B,), -1, jnp.int32)

    dp_mm = (rb == fb) | (fties > 1)
    dp_status = jnp.where(
        rb > fb, RC_BEST,
        jnp.where(dp_mm, MULTIMAP,
                  jnp.where(fb < s.as_min, LOW_AS,
                            jnp.where(fuval & (fqpos >= 0) &
                                      (fqpos + s.umi_len <= qlen),
                                      ACCEPT, BAD_UMI))))
    dp_bc = jnp.where((dp_status == ACCEPT) | (dp_status == BAD_UMI),
                      fidx, -1)
    status = jnp.where(need_dp, dp_status, status)
    score = jnp.where(need_dp, fb, score)
    bc = jnp.where(need_dp, dp_bc, bc)
    qpos = jnp.where(need_dp, fqpos, qpos)

    if tiers is not None:
        nd16, ebc16, eq16, nd15, ebc15, eq15, rc16, rc15 = tiers
        t16 = nonempty & (nd16 >= 1)
        t15 = nonempty & (nd16 == 0) & (nd15 >= 1)
        rc_only = nonempty & (nd16 == 0) & (nd15 == 0) & (rc16 | rc15)

        s16 = jnp.int32(m)
        u16ok = (eq16 >= 0) & (eq16 + s.umi_len <= qlen)
        st16 = jnp.where((nd16 > 1) | rc16, MULTIMAP,
                         jnp.where(u16ok, ACCEPT, BAD_UMI))
        status = jnp.where(t16, st16, status)
        score = jnp.where(t16, s16, score)
        bc = jnp.where(t16 & (st16 != MULTIMAP), ebc16, bc)
        qpos = jnp.where(t16 & (st16 != MULTIMAP), eq16, qpos)

        u15ok = (eq15 >= 0) & (eq15 + s.umi_len <= qlen)
        st15 = jnp.where(rc16, RC_BEST,
                         jnp.where((nd15 > 1) | rc15, MULTIMAP,
                                   jnp.where(u15ok, ACCEPT, BAD_UMI)))
        status = jnp.where(t15, st15, status)
        score = jnp.where(t15, s16 - 1, score)
        t15_keep = t15 & ((st15 == ACCEPT) | (st15 == BAD_UMI))
        bc = jnp.where(t15_keep, ebc15, bc)
        qpos = jnp.where(t15_keep, eq15, qpos)

        status = jnp.where(rc_only, RC_BEST, status)
        score = jnp.where(rc_only,
                          jnp.where(rc16, s16, s16 - 1) - 1, score)

    off = jnp.arange(s.umi_len, dtype=jnp.int32)[None, :]
    uidx = jnp.clip(qpos[:, None] + off, 0, Lq - 1)
    umi = jnp.take_along_axis(q, uidx, axis=1)
    umi = jnp.where((status == ACCEPT)[:, None], umi, PAD)
    return bc, score, status, umi, qpos


def revcomp_rows(q, qlen):
    """Per-row reverse complement of the valid prefix (PAD tail stays)."""
    B, Lq = q.shape
    jj = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    src = qlen[:, None] - 1 - jj
    vals = jnp.asarray(COMPLEMENT)[jnp.take_along_axis(
        q, jnp.clip(src, 0, Lq - 1), axis=1)]
    return jnp.where(jj < qlen[:, None], vals, PAD).astype(q.dtype)


class BarcodeMatcher:
    """Holds device-resident whitelist tables for one chemistry.

    dp_chunk bounds the per-dispatch exhaustive-DP sub-batch; a
    while_loop covers any number of flagged candidates exactly."""

    def __init__(self, barcodes: np.ndarray, spec: BarcodeMatchSpec,
                 dp_chunk: int = 256, **_compat):
        import threading
        self._aot_fn = None
        self._aot_shape = None
        self._aot_lock = threading.Lock()
        self.spec = spec
        self.dp_chunk = dp_chunk
        self.barcodes = np.asarray(barcodes)
        refs_np, ref_len = wl.padded_refs(self.barcodes, spec)
        self.ref_len = int(ref_len)
        self.refs = jnp.asarray(refs_np)
        # band columns [pad_left, umi_ref_offset] for the TPU banded
        # per-pair rescorer (N pads outside have closed-form DP — ops/sw)
        self.refs_band = jnp.asarray(
            refs_np[:, spec.pad_left:spec.umi_ref_offset + 1])
        # core columns (the structure between the pads), transposed for
        # the one-vs-all verify kernel; == the barcode for plain
        # whitelists, bc8+linker+bc6 for slideseq
        self.core_len = spec.umi_ref_offset - spec.pad_left
        self._coreT_np = np.ascontiguousarray(
            refs_np[:, spec.pad_left:spec.umi_ref_offset].T)
        assert spec.as_min <= self.core_len - 1, \
            "tier scores must clear as_min"

        # exact-structure tier tables: sorted 2-bit keys of the cores and
        # of their revcomps (bc_len <= 16 so keys fit uint32; slideseq's
        # 32-char structure exceeds that — its 17k-bead whitelist goes
        # straight to the exhaustive DP, which is cheap at that scale)
        self._ex_np = None
        if not spec.slideseq_linker and spec.bc_len <= 16:
            bc_codes, _ = encode_batch([b for b in self.barcodes],
                                       max_len=spec.bc_len)
            keys = np.zeros(len(self.barcodes), np.uint32)
            for t in range(spec.bc_len):
                keys = (keys << np.uint32(2)) | bc_codes[:, t].astype(np.uint32)
            order = np.argsort(keys, kind="stable")
            rc_codes = COMPLEMENT[bc_codes][:, ::-1]
            rkeys = np.zeros(len(self.barcodes), np.uint32)
            for t in range(spec.bc_len):
                rkeys = (rkeys << np.uint32(2)) | rc_codes[:, t].astype(np.uint32)
            self._ex_np = (keys[order], order.astype(np.int32),
                           np.sort(rkeys))
        self._ex_dev = None
        self._core_dev = None

    # -- tables ------------------------------------------------------------

    def device_tables(self):
        """The table arrays the jit-composable match consumes, as an
        explicit pytree — callers building large fused programs pass
        these as ARGUMENTS so the compiled executable stays table-free
        (constant-embedding bloats executables ~20x and makes cache keys
        content-dependent)."""
        banded = jax.default_backend() != "cpu"
        if self._core_dev is None:
            self._core_dev = jnp.asarray(self._coreT_np)
        t = {"refs": self.refs_band if banded else self.refs,
             "coreT": self._core_dev}
        if self._ex_np is not None:
            if self._ex_dev is None:
                self._ex_dev = tuple(jnp.asarray(a) for a in self._ex_np)
            t["ex_keys"], t["ex_idx"], t["rc_ex_keys"] = self._ex_dev
        return t

    # -- exhaustive DP tail ------------------------------------------------

    def _dp_pass(self, q, qlen, t, need_dp):
        """Exhaustive forward+reverse scoring of flagged rows in
        dp_chunk-sized sub-batches under a while_loop; returns full-size
        (fb, fidx, fties, rb, fqpos, fuval) with untouched rows at NEG."""
        B, Lq = q.shape
        s = self.spec
        M = min(self.dp_chunk, B)
        coreT = t["coreT"]
        R = len(self.barcodes)
        banded = jax.default_backend() != "cpu"
        pad_left = s.pad_left if banded else None
        full_len = self.ref_len if banded else None

        order = jnp.argsort(jnp.where(need_dp, 0, 1).astype(jnp.int32),
                            stable=True)
        n_flag = jnp.sum(need_dp.astype(jnp.int32))

        init = (jnp.full((B,), NEG, jnp.int32),
                jnp.full((B,), -1, jnp.int32),
                jnp.zeros((B,), jnp.int32),
                jnp.full((B,), NEG, jnp.int32),
                jnp.full((B,), -1, jnp.int32),
                jnp.zeros((B,), bool),
                jnp.int32(0))

        def cond(state):
            return state[-1] * M < n_flag

        def body(state):
            fb, fidx, fties, rb, fqpos, fuval, k = state
            rows = jax.lax.dynamic_slice(order, (k * M,), (M,))
            slot_ok = (k * M + jnp.arange(M, dtype=jnp.int32)) < n_flag
            qs = q[rows]
            qls = jnp.where(slot_ok, qlen[rows], 0)
            qrc = revcomp_rows(qs, qls)
            qq = jnp.concatenate([qs, qrc], axis=0)
            qql = jnp.concatenate([qls, qls])
            best, idx, ties = verify_all(qq, qql, coreT, R,
                                         s.pad_left, s.pad_right)
            fbc, rbc = best[:M], best[M:]
            fic = idx[:M]
            ftc = ties[:M]
            # UMI query position of the forward winner (per-pair banded
            # rescore against the winning padded row)
            ref_rows = t["refs"][jnp.clip(fic, 0, t["refs"].shape[0] - 1)]
            sc2, qp, uv = sw_end2end(
                qs, qls, ref_rows,
                jnp.full((M,), self.ref_len, jnp.int32),
                s.umi_ref_offset, pad_left=pad_left, full_len=full_len)
            tgt = jnp.where(slot_ok, rows, B)     # out-of-range -> dropped
            fb = fb.at[tgt].set(fbc, mode="drop")
            fidx = fidx.at[tgt].set(fic, mode="drop")
            fties = fties.at[tgt].set(ftc, mode="drop")
            rb = rb.at[tgt].set(rbc, mode="drop")
            fqpos = fqpos.at[tgt].set(qp, mode="drop")
            fuval = fuval.at[tgt].set(uv, mode="drop")
            return fb, fidx, fties, rb, fqpos, fuval, k + 1

        fb, fidx, fties, rb, fqpos, fuval, _ = jax.lax.while_loop(
            cond, body, init)
        return fb, fidx, fties, rb, fqpos, fuval

    # -- the match ---------------------------------------------------------

    def match_device_with(self, q, qlen, t):
        """Jit-composable match from explicit tables (device_tables()).
        Returns (bc, score, status, umi, qpos)."""
        B, Lq = q.shape
        s = self.spec
        m = self.core_len
        tiers = "ex_keys" in t
        if tiers:
            nd16, ebc16, eq16 = exact_window_hits(
                q, qlen, t["ex_keys"], t["ex_idx"], s.bc_len,
                s.pad_left, s.pad_right)
            nd15, ebc15, eq15 = ins1_window_hits(
                q, qlen, t["ex_keys"], t["ex_idx"], s.bc_len,
                s.pad_left, s.pad_right)
            rc16 = exact_window_any(q, qlen, t["rc_ex_keys"], s.bc_len,
                                    s.pad_right, s.pad_left)
            rc15 = ins1_window_any(q, qlen, t["rc_ex_keys"], s.bc_len,
                                   s.pad_right, s.pad_left)
            tier_hit = (nd16 >= 1) | (nd15 >= 1) | rc16 | rc15
            tiers_tuple = (nd16, ebc16, eq16, nd15, ebc15, eq15, rc16,
                           rc15)
        else:
            tier_hit = jnp.zeros((B,), bool)
            tiers_tuple = None

        need_dp = (qlen > 0) & ~tier_hit
        fb, fidx, fties, rb, fqpos, fuval = self._dp_pass(q, qlen, t,
                                                          need_dp)
        return combine_verdicts(
            q, qlen, s, m, tiers_tuple,
            (need_dp, fb, fidx, fties, rb, fqpos, fuval))

    def match_device(self, q, qlen):
        """Jit-composable match: returns (bc, score, status, umi, qpos)."""
        return self.match_device_with(q, qlen, self.device_tables())

    def enable_aot(self, batch: int, Lq: int, log=None):
        """AOT-cache the standalone match program for (batch, Lq) inputs
        (runtime/aot_cache.py). Idempotent; thread-safe; no-op on CPU or
        with NANORANGER_AOT=0."""
        import os as _os
        if (jax.default_backend() == "cpu" or
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
                     self.dp_chunk, int(len(self.barcodes)), self.ref_len,
                     "exact_v5")
            self._aot_fn = get_or_compile("match", fn, example, extra,
                                          log=log)
            self._aot_shape = (batch, Lq)
            self._aot_tables = t

    # -- host-orchestrated CPU path -----------------------------------------

    def _tier_fn_for(self, shape):
        if getattr(self, "_tier_fn", None) is None or \
                self._tier_shape != shape:
            s = self.spec

            @jax.jit
            def fn(q, qlen, ex_keys, ex_idx, rc_ex_keys):
                nd16, ebc16, eq16 = exact_window_hits(
                    q, qlen, ex_keys, ex_idx, s.bc_len, s.pad_left,
                    s.pad_right)
                nd15, ebc15, eq15 = ins1_window_hits(
                    q, qlen, ex_keys, ex_idx, s.bc_len, s.pad_left,
                    s.pad_right)
                rc16 = exact_window_any(q, qlen, rc_ex_keys, s.bc_len,
                                        s.pad_right, s.pad_left)
                rc15 = ins1_window_any(q, qlen, rc_ex_keys, s.bc_len,
                                       s.pad_right, s.pad_left)
                return nd16, ebc16, eq16, nd15, ebc15, eq15, rc16, rc15

            self._tier_fn = fn
            self._tier_shape = shape
        return self._tier_fn

    def _match_host(self, q: np.ndarray, qlen: np.ndarray):
        """CPU execution: tier passes jitted, the DP tail compacted on
        host and routed through the native C++ one-vs-all scorer
        (runtime/native/whitelist_verify.cpp; XLA-scan fallback).  Exact
        same results as the in-jit path — the XLA scan fallback costs
        ~1.7 s/candidate vs 737K on a 2-core host, the native kernel
        ~0.1 s with all cores."""
        from ..io.encode import revcomp_batch_padded
        from ..runtime.native_lib import wl_verify_all
        s = self.spec
        B, Lq = q.shape
        qlen = np.asarray(qlen, np.int32)
        if self._ex_np is not None:
            t = self.device_tables()
            outs = self._tier_fn_for(q.shape)(
                jnp.asarray(q), jnp.asarray(qlen), t["ex_keys"],
                t["ex_idx"], t["rc_ex_keys"])
            (nd16, ebc16, eq16, nd15, ebc15, eq15, rc16,
             rc15) = map(np.asarray, outs)
            tier_hit = (nd16 >= 1) | (nd15 >= 1) | rc16 | rc15
            tiers = tuple(jnp.asarray(a) for a in
                          (nd16, ebc16, eq16, nd15, ebc15, eq15, rc16,
                           rc15))
        else:
            tier_hit = np.zeros(B, bool)
            tiers = None
        need = (qlen > 0) & ~tier_hit
        rows = np.where(need)[0]
        NEGv = np.int32(NEG)
        fb = np.full(B, NEGv, np.int32)
        fidx = np.full(B, -1, np.int32)
        fties = np.zeros(B, np.int32)
        rb = np.full(B, NEGv, np.int32)
        fqpos = np.full(B, -1, np.int32)
        fuval = np.zeros(B, bool)
        if len(rows):
            qs = np.ascontiguousarray(q[rows])
            qls = qlen[rows]
            qrc = revcomp_batch_padded(qs, qls)
            qq = np.concatenate([qs, qrc], axis=0)
            qql = np.concatenate([qls, qls])
            out = wl_verify_all(qq, qql, self._coreT_np, s.pad_left,
                                s.pad_right)
            if out is None:               # no compiler: XLA-scan fallback
                out = tuple(np.asarray(a) for a in verify_all_xla(
                    jnp.asarray(qq), jnp.asarray(qql),
                    jnp.asarray(self._coreT_np), len(self.barcodes),
                    s.pad_left, s.pad_right))
            best, idx, ties = out
            n = len(rows)
            fb[rows] = best[:n]
            fidx[rows] = idx[:n]
            fties[rows] = ties[:n]
            rb[rows] = best[n:]
            refs = np.asarray(self.refs)
            ref_rows = refs[np.clip(idx[:n], 0, refs.shape[0] - 1)]
            sc2, qp, uv = map(np.asarray, sw_end2end(
                jnp.asarray(qs), jnp.asarray(qls), jnp.asarray(ref_rows),
                jnp.full((n,), self.ref_len, jnp.int32),
                s.umi_ref_offset))
            fqpos[rows] = qp
            fuval[rows] = uv
        bc, score, status, umi, qpos = combine_verdicts(
            jnp.asarray(q), jnp.asarray(qlen), s, self.core_len, tiers,
            (jnp.asarray(need), jnp.asarray(fb), jnp.asarray(fidx),
             jnp.asarray(fties), jnp.asarray(rb), jnp.asarray(fqpos),
             jnp.asarray(fuval)))
        return {"bc_idx": np.asarray(bc), "score": np.asarray(score),
                "status": np.asarray(status), "umi": np.asarray(umi),
                "qpos": np.asarray(qpos)}

    def match(self, q: np.ndarray, qlen: np.ndarray):
        """q: (B, Lq) int8 BC-UMI candidates; returns dict of numpy arrays."""
        if jax.default_backend() == "cpu":
            return self._match_host(np.asarray(q), np.asarray(qlen))
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
