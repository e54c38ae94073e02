"""Barcode matching stage: exact structure tiers + exhaustive DP.

Replaces the reference's STAR sub-stack (write_bc_* → barcode_ref.sh →
barcode_align.sh → process_matching_* SAM scan; SURVEY.md §3.5) with one
jitted device step that is EXACT by construction.

The end-to-end score of a candidate against a padded whitelist row
N^PL + core + N^PR decomposes as  score = m − 2(mm + del) − ins − ov
where m = core length and ov = pad-overflow insertions
(max(0, start − PL) + max(0, tail − PR)).  The top three scores
therefore admit a COMPLETE hash enumeration ("tiers"):

  cost 0  exact core window                      (1 / window)
  cost 1  one interior insertion                 (m-1 / window)
  cost 2  one substitution                       (3m / window)
          one core-char deletion                 (4m / window)
          two interior insertions                (C(m,2) / window)

bucketed by tier = m − (class_cost + ov) ∈ {m, m-1, m-2}; everything
scoring below m−2 on BOTH strands goes to the exhaustive one-vs-all DP
(ops/whitelist_verify) against the FULL whitelist.  This is the STAR
semantics itself: ties at the best score (any score) drop the read
(--outFilterMultimapNmax 1 / --outFilterMultimapScoreRange 0), a better
reverse-strand alignment yields a flag-16 row the reference rejects
(utils.py:699), and the accepted barcode/UMI come from the unique best
alignment.  Round 4's screened matcher agreed with the exhaustive
arbiter on ~94% of candidates (tests/goldens/match_parity.json); this
design agrees by construction, with tools/match_parity.py validating
the implementation against an independent per-pair scorer.

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

# tiers resolved by hash enumeration: m, m-1, m-2
N_TIERS = 3


# --------------------------------------------------------------------------
# cuckoo hash tables: the TPU-side replacement for sorted-key binary
# search.  jnp.searchsorted lowers to ~20 dependent HBM gathers per key
# (measured 0.17-0.31 us/key on the 737K table — 27 s for one full-class
# enumeration batch); a two-table cuckoo probe is 4 INDEPENDENT gathers
# (~30 ns/key).  Build is host-side numpy, vectorized rounds with
# last-writer-wins scatters; growth on (astronomically rare) cycles.

_CK1 = np.uint32(2654435761)          # Knuth multiplicative
_CK2 = np.uint32(2246822519)          # xxhash prime 2


def _cuckoo_pos(k, log2s: int, side: int):
    mult = _CK1 if side == 0 else _CK2
    return (k * mult) >> np.uint32(32 - log2s)


def _cuckoo_insert_all(keys, vals, tk, tv, log2s, max_rounds=256):
    S = 1 << log2s
    pk = keys.astype(np.uint32)
    pv = vals.astype(np.int32)
    for rnd in range(max_rounds):
        if len(pk) == 0:
            return True
        side = rnd % 2
        pos = _cuckoo_pos(pk, log2s, side).astype(np.int64) + side * S
        old_k = tk[pos].copy()
        old_v = tv[pos].copy()
        tk[pos] = pk
        tv[pos] = pv
        placed = (tk[pos] == pk) & (tv[pos] == pv)
        evic = placed & (old_v >= 0) & ((old_k != pk) | (old_v != pv))
        pk = np.concatenate([pk[~placed], old_k[evic]])
        pv = np.concatenate([pv[~placed], old_v[evic]])
    return False


def build_cuckoo(keys: np.ndarray, vals: np.ndarray):
    """(tk (2S,) uint32, tv (2S,) int32, log2s).  tv == -1 marks empty
    slots (keys span the full uint32 range, so emptiness cannot be a
    key sentinel)."""
    n = max(int(len(keys)), 2)
    log2s = max(8, int(np.ceil(np.log2(n * 1.45))))
    while True:
        S = 1 << log2s
        tk = np.zeros(2 * S, np.uint32)
        tv = np.full(2 * S, -1, np.int32)
        if _cuckoo_insert_all(keys, vals, tk, tv, log2s):
            return tk, tv, log2s
        log2s += 1


def cuckoo_lookup(keys, tk, tv, log2s: int):
    """keys (...,) uint32 -> (found bool, val int32).  4 independent
    gathers; rows not in the table return (False, -1)."""
    S = np.int32(1 << log2s)
    sh = np.uint32(32 - log2s)
    h1 = ((keys * _CK1) >> sh).astype(jnp.int32)
    h2 = ((keys * _CK2) >> sh).astype(jnp.int32) + S
    k1 = jnp.take(tk, h1)
    k2 = jnp.take(tk, h2)
    v1 = jnp.take(tv, h1)
    v2 = jnp.take(tv, h2)
    f1 = (k1 == keys) & (v1 >= 0)
    f2 = (k2 == keys) & (v2 >= 0)
    return f1 | f2, jnp.where(f1, v1, jnp.where(f2, v2, -1))


def pack_window_keys(q, bc_len: int):
    """2-bit keys of every bc_len-window of each row: (B, W) uint32 +
    validity (no N/PAD inside the window). bc_len <= 16.
    NOTE: keys pack RAW codes — windows containing N/PAD have garbage
    bits and must be masked via the returned validity."""
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


def _hits_summary(found, hit_bc, end_pos):
    """Across a row's hit set: (any hit, >=2 DISTINCT barcodes, smallest
    hitting barcode id or -1, largest end_pos among hits of that
    barcode).  min!=max detects multiplicity without a sort — the
    verdict logic only ever needs any / >=2 (STAR's multimap drop);
    sharded callers merge losslessly via global min/max ids."""
    BIGV = jnp.int32(1 << 30)
    mn = jnp.min(jnp.where(found, hit_bc, BIGV), axis=1)
    mx = jnp.max(jnp.where(found, hit_bc, -1), axis=1)
    any_ = mx >= 0
    multi = any_ & (mn != mx)
    ebc = jnp.where(any_, mn, -1)
    last = jnp.max(jnp.where(found & (hit_bc == ebc[:, None]), end_pos,
                             -1), axis=1)
    return any_, multi, ebc, jnp.where(any_, last, -1)


def _class_entries(q, qlen, m: int, classes: str = "full"):
    """All candidate-structure occurrences for the tier enumeration:
    list of (keys (B, K) uint32, kept-chars-real (B, K) bool,
    start (1or B, K) int32, wlen int, cost int).

    Classes (see module docstring): exact, 1 interior insertion,
    1 substitution, 1 deletion, 2 interior insertions.  All packing
    uses CLEANED codes (N/PAD -> 0; raw codes >= 4 overflow their 2-bit
    field into the neighbouring char's bits); garbage is rejected by
    the real-char range sums, never by key value.

    classes="exact" emits ONLY the cost-0 exact windows (the cheap
    first pass: ~80 keys/candidate vs ~21,000 for the full set) —
    callers may then use only the tier-m bucket, since lower tiers are
    incomplete without the edit classes."""
    B, Lq = q.shape
    real = (q >= 0) & (q < 4)
    cs = jnp.concatenate([jnp.zeros((B, 1), jnp.int32),
                          jnp.cumsum(real.astype(jnp.int32), axis=1)],
                         axis=1)

    def ok_range(p0, length):
        a = jnp.take_along_axis(cs, jnp.clip(p0, 0, Lq), axis=1)
        b = jnp.take_along_axis(cs, jnp.clip(p0 + length, 0, Lq), axis=1)
        return (b - a) == length

    qpad = jnp.pad(jnp.where(real, q, 0), ((0, 0), (0, m + 2)),
                   constant_values=0).astype(q.dtype)
    keysF, _ = pack_window_keys(qpad, m)            # (B, Lq+3)
    out = []

    # --- exact (cost 0)
    W = Lq - m + 1
    i0 = jnp.arange(W, dtype=jnp.int32)[None, :]
    out.append((keysF[:, :W], ok_range(i0, m), i0, m, 0))
    if classes == "exact":
        return out

    # --- 1 interior insertion (cost 1): (m+1)-windows, delete offset d
    W1 = Lq - m
    if W1 >= 1:
        i1 = jnp.arange(W1, dtype=jnp.int32)[None, :]
        pre = jnp.zeros((B, W1), jnp.uint32)
        pre_ok = jnp.ones((B, W1), bool)
        c2 = jnp.where(real, q, 0).astype(jnp.uint32)
        ks, vs = [], []
        for d in range(1, m):
            pre = (pre << 2) | c2[:, d - 1:d - 1 + W1]
            pre_ok = pre_ok & real[:, d - 1:d - 1 + W1]
            suf = keysF[:, d + 1:d + 1 + W1] >> jnp.uint32(2 * d)
            suf_ok = ok_range(i1 + d + 1, m - d)
            ks.append((pre << jnp.uint32(2 * (m - d))) | suf)
            vs.append(pre_ok & suf_ok)
        out.append((jnp.stack(ks, 2).reshape(B, -1),
                    jnp.stack(vs, 2).reshape(B, -1),
                    jnp.repeat(i1, m - 1, axis=1), m + 1, 1))

    # --- 1 substitution (cost 2): m-windows, replace position p
    base_k = keysF[:, :W]
    base_ok = ok_range(i0, m)
    ks, vs = [], []
    for p in range(m):
        sh = jnp.uint32(2 * (m - 1 - p))
        orig = (base_k >> sh) & jnp.uint32(3)
        stripped = base_k & ~(jnp.uint32(3) << sh)
        for d in range(1, 4):
            x = (orig + jnp.uint32(d)) & jnp.uint32(3)
            ks.append(stripped | (x << sh))
            vs.append(base_ok)
    out.append((jnp.stack(ks, 2).reshape(B, -1),
                jnp.stack(vs, 2).reshape(B, -1),
                jnp.repeat(i0, 3 * m, axis=1), m, 2))

    # --- 1 deletion (cost 2): (m-1)-windows, re-insert any char anywhere
    Wd = Lq - m + 2
    idd = jnp.arange(Wd, dtype=jnp.int32)[None, :]
    k15 = keysF[:, :Wd] >> jnp.uint32(2)            # top m-1 chars
    ok15 = ok_range(idd, m - 1)
    ks, vs = [], []
    for p in range(m):
        lo_bits = jnp.uint32(2 * (m - 1 - p))
        lo_mask = (jnp.uint32(1) << lo_bits) - jnp.uint32(1)
        hi = (k15 >> lo_bits) << (lo_bits + jnp.uint32(2))
        lo = k15 & lo_mask
        for x in range(4):
            ks.append(hi | (jnp.uint32(x) << lo_bits) | lo)
            vs.append(ok15)
    out.append((jnp.stack(ks, 2).reshape(B, -1),
                jnp.stack(vs, 2).reshape(B, -1),
                jnp.repeat(idd, 4 * m, axis=1), m - 1, 2))

    # --- 2 interior insertions (cost 2): (m+2)-windows, delete a<b
    W2 = Lq - m - 1
    if W2 >= 1:
        i2 = jnp.arange(W2, dtype=jnp.int32)[None, :]
        okW = ok_range(i2, m + 2)
        ks = []
        npairs = 0
        for a in range(1, m + 1):
            pre = keysF[:, :W2] >> jnp.uint32(2 * (m - a)) if a < m \
                else keysF[:, :W2]
            for b in range(a + 1, m + 2):
                lmid = b - a - 1
                lsuf = m + 1 - b
                mid = (keysF[:, a + 1:a + 1 + W2] >>
                       jnp.uint32(2 * (m - lmid))) if lmid else 0
                suf = (keysF[:, b + 1:b + 1 + W2] >>
                       jnp.uint32(2 * (m - lsuf))) if lsuf else 0
                ks.append((pre << jnp.uint32(2 * (lmid + lsuf)))
                          | (mid << jnp.uint32(2 * lsuf)) | suf)
                npairs += 1
        out.append((jnp.stack(ks, 2).reshape(B, -1),
                    jnp.repeat(okW, npairs, axis=1),
                    jnp.repeat(i2, npairs, axis=1), m + 2, 2))
    return out


def tier_hits(q, qlen, keys_sorted, idx_sorted, bc_len: int, max_pre: int,
              max_suf: int, any_only: bool = False, classes: str = "full",
              cuckoo=None):
    """Per tier t in (m, m-1, m-2): (any, multi, ebc, eqpos) of every
    score-t locus — class enumerations bucketed by
    tier = m − (class_cost + pad_overflow).  With any_only=True returns
    just the three `any` vectors (the reverse-strand pass).

    idx_sorted entries < 0 mark padding rows (sharded whitelists).

    classes="exact": cost-0 enumeration only — ONLY the tier-m bucket
    (res[0]) is complete; lower buckets carry just the exact class's
    pad-overflow entries and must not be used as tier verdicts.

    cuckoo=(tk, tv, log2s) replaces the sorted-key binary search with
    4-gather hash probes (same results; ~7x faster on TPU)."""
    B, Lq = q.shape
    m = bc_len
    entries = _class_entries(q, qlen, m, classes)
    keys = jnp.concatenate([e[0] for e in entries], axis=1)
    valid = jnp.concatenate([e[1] for e in entries], axis=1)
    start = jnp.concatenate([jnp.broadcast_to(e[2], e[0].shape)
                             for e in entries], axis=1)
    wlen = jnp.concatenate([jnp.full(e[0].shape[1], e[3], jnp.int32)
                            for e in entries])[None, :]
    cost = jnp.concatenate([jnp.full(e[0].shape[1], e[4], jnp.int32)
                            for e in entries])[None, :]
    tail = qlen[:, None] - (start + wlen)
    ov = jnp.maximum(start - max_pre, 0) + jnp.maximum(tail - max_suf, 0)
    total = cost + ov
    base = valid & (tail >= 0)
    if cuckoo is not None:
        in_tbl, hit_val = cuckoo_lookup(keys, *cuckoo)
        found_all = base & in_tbl
    else:
        pos_c, eq = _lookup(keys, keys_sorted)
        hit_val = idx_sorted[pos_c]
        found_all = base & eq & (hit_val >= 0)
    ends = start + wlen
    res = []
    for t in range(N_TIERS):
        found = found_all & (total == t)
        if any_only:
            res.append(jnp.any(found, axis=1))
        else:
            hit_bc = jnp.where(found, hit_val, 1 << 30)
            res.append(_hits_summary(found, hit_bc, ends))
    return res


def boundary_flags(q, qlen, tabs, m: int, max_pre: int, max_suf: int):
    """(B,) bool: the candidate admits a boundary-truncated alignment at
    tier >= m-2 against SOME core — a 1- or 2-truncated core suffix
    anchored at query position 0, or core prefix anchored at qlen,
    optionally with one interior insertion or one pad overflow.  The DP
    enters/exits the core for free at the query boundaries (reference-
    local alignment), so these structures score m-1 / m-2 yet are
    invisible to the interior edit classes of `_class_entries`; flagged
    candidates must resolve through the exhaustive DP.  Any-only.

    tabs = (suf1, suf2, pre1, pre2) sorted key tables of the truncated
    cores for ONE strand; call twice (fwd tables with (pad_left,
    pad_right), rc tables with the pads swapped)."""
    B, Lq = q.shape
    suf1, suf2, pre1, pre2 = tabs
    real = (q >= 0) & (q < 4)
    c = jnp.where(real, q, 0).astype(jnp.uint32)
    flag = jnp.zeros(B, bool)
    if int(suf1.shape[0]) == 0 or m < 4 or Lq < m:
        return flag

    def in_tab(keys, tab):
        pos = jnp.clip(jnp.searchsorted(tab, keys.reshape(-1)),
                       0, tab.shape[0] - 1).reshape(keys.shape)
        return tab[pos] == keys

    def pack_start(L):
        k = jnp.zeros(B, jnp.uint32)
        v = qlen >= L
        for i in range(L):
            k = (k << jnp.uint32(2)) | c[:, i]
            v = v & real[:, i]
        return k, v

    def gather_end(L):
        idx = qlen[:, None] - L + jnp.arange(L, dtype=jnp.int32)[None, :]
        ok = idx >= 0
        idxc = jnp.clip(idx, 0, Lq - 1)
        ch = jnp.take_along_axis(c, idxc, axis=1)
        rl = jnp.take_along_axis(real, idxc, axis=1) & ok
        return ch, rl

    def pack_rows(ch, rl):
        L = ch.shape[1]
        k = jnp.zeros(B, jnp.uint32)
        for i in range(L):
            k = (k << jnp.uint32(2)) | ch[:, i]
        return k, rl.all(axis=1)

    def del_keys(ch, rl):
        """All L-1 char keys of ch with one position deleted: (B, L)."""
        L = ch.shape[1]
        pre = jnp.zeros(B, jnp.uint32)
        ks, vs = [], []
        suf = [jnp.zeros(B, jnp.uint32)]
        for i in range(L - 1, 0, -1):
            suf.append((suf[-1]) | (ch[:, i].astype(jnp.uint32)
                                    << jnp.uint32(2 * (L - 1 - i))))
        suf = suf[::-1]          # suf[p] = pack of ch[p+1:], aligned low
        base_ok = rl.all(axis=1)
        for p in range(L):
            ks.append((pre << jnp.uint32(2 * (L - 1 - p))) | suf[p])
            vs.append(base_ok)
            pre = (pre << jnp.uint32(2)) | ch[:, p]
        return jnp.stack(ks, 1), jnp.stack(vs, 1)

    ov_s = lambda wl: jnp.maximum(qlen - wl - max_suf, 0)   # start-anchor
    ov_e = lambda wl: jnp.maximum(qlen - wl - max_pre, 0)   # end-anchor

    # start-anchored: core suffix at query 0
    k, v = pack_start(m - 1)
    flag |= v & in_tab(k, suf1) & (1 + ov_s(m - 1) <= 2)
    k, v = pack_start(m - 2)
    flag |= v & in_tab(k, suf2) & (2 + ov_s(m - 2) <= 2)
    ch0 = c[:, :m]
    rl0 = real[:, :m] & (jnp.arange(m)[None, :] < qlen[:, None])
    kd, vd = del_keys(ch0, rl0)
    flag |= ((vd & in_tab(kd, suf1)).any(axis=1) &
             (2 + ov_s(m) <= 2) & (qlen >= m))

    # end-anchored: core prefix at qlen
    ch, rl = gather_end(m - 1)
    k, v = pack_rows(ch, rl)
    flag |= v & in_tab(k, pre1) & (1 + ov_e(m - 1) <= 2)
    ch, rl = gather_end(m - 2)
    k, v = pack_rows(ch, rl)
    flag |= v & in_tab(k, pre2) & (2 + ov_e(m - 2) <= 2)
    ch, rl = gather_end(m)
    kd, vd = del_keys(ch, rl)
    flag |= (vd & in_tab(kd, pre1)).any(axis=1) & (2 + ov_e(m) <= 2)

    return flag & (qlen > 0)


def combine_verdicts(q, qlen, spec, core_len, tiers, dp):
    """The arbitration of the exhaustive arbiter (tools/match_parity.py):
    rc>fwd -> RC_BEST; rc==fwd or fwd ties -> MULTIMAP; fwd<as_min ->
    LOW_AS; else ACCEPT/BAD_UMI.  `tiers` is None or
    (fwd_tiers, rc_any) where fwd_tiers = [(any, multi, ebc, eqpos)]
    and rc_any = [any] for tier scores (m, m-1, m-2), all GLOBAL values;
    `dp` is (need_dp, fb, fidx, fties, rb, fqpos, fuval) with fidx
    global.  Shared by the single-chip matcher and the sharded matcher
    (which merges shard-local tier/DP results over 'wl' first)."""
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
        fwd, rc_any = tiers
        higher_fwd = jnp.zeros((B,), bool)
        rc_higher = jnp.zeros((B,), bool)
        for t in range(N_TIERS):
            any_t, multi_t, ebc_t, eq_t = fwd[t]
            r_t = rc_any[t]
            row = nonempty & ~higher_fwd & any_t
            st = jnp.where(rc_higher, RC_BEST,
                           jnp.where(multi_t | r_t, MULTIMAP,
                                     jnp.where((eq_t >= 0) &
                                               (eq_t + s.umi_len <= qlen),
                                               ACCEPT, BAD_UMI)))
            status = jnp.where(row, st, status)
            score = jnp.where(row, jnp.int32(m - t), score)
            keepers = row & ((st == ACCEPT) | (st == BAD_UMI))
            bc = jnp.where(keepers, ebc_t, bc)
            qpos = jnp.where(keepers, eq_t, qpos)
            higher_fwd = higher_fwd | any_t
            rc_higher = rc_higher | r_t
        # rc-only rows: some rc structure outranks every fwd one
        rc_only = nonempty & ~higher_fwd & rc_higher
        status = jnp.where(rc_only, RC_BEST, status)
        score = jnp.where(rc_only, jnp.int32(m - 1), score)

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
        assert spec.as_min <= self.core_len - (N_TIERS - 1), \
            "tier scores must clear as_min"

        # tier tables: sorted 2-bit keys of the cores and of their
        # revcomps (bc_len <= 16 so keys fit uint32; slideseq's 32-char
        # structure exceeds that — its 17k-bead whitelist goes straight
        # to the exhaustive DP, which is cheap at that scale)
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

            # boundary-truncation tables (round-5 exactness fix): the DP
            # enters/exits the core for FREE at query position 0 / qlen
            # (STAR aligns the query against the padded row as a local
            # reference), so a core SUFFIX anchored at the query start —
            # or a core PREFIX anchored at the query end — scores
            # m-k_trunc without any per-column cost.  Those alignments
            # live outside the interior edit classes; candidates showing
            # one at tier >= m-2 are routed to the exhaustive DP
            # (boundary_flags).  Sorted any-only key tables of the
            # 1- and 2-truncated cores, both strands.
            def _pack(codes):
                k = np.zeros(codes.shape[0], np.uint32)
                for t in range(codes.shape[1]):
                    k = (k << np.uint32(2)) | codes[:, t].astype(np.uint32)
                return np.sort(k)

            self._bnd_np = {
                "suf1": _pack(bc_codes[:, 1:]),
                "suf2": _pack(bc_codes[:, 2:]),
                "pre1": _pack(bc_codes[:, :-1]),
                "pre2": _pack(bc_codes[:, :-2]),
                "rc_suf1": _pack(rc_codes[:, 1:]),
                "rc_suf2": _pack(rc_codes[:, 2:]),
                "rc_pre1": _pack(rc_codes[:, :-1]),
                "rc_pre2": _pack(rc_codes[:, :-2]),
            }
        self._ex_dev = None
        self._bnd_dev = None
        self._ck_dev = None
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
            if self._bnd_dev is None:
                self._bnd_dev = tuple(
                    jnp.asarray(self._bnd_np[k])
                    for k in ("suf1", "suf2", "pre1", "pre2",
                              "rc_suf1", "rc_suf2", "rc_pre1", "rc_pre2"))
            t["bnd"] = self._bnd_dev
            if banded:
                # cuckoo tables ride along on accelerators (tier lookups
                # probe them instead of binary-searching the sorted keys
                # — ~7x fewer HBM gathers); built lazily so CPU-path
                # matchers never pay for them
                if self._ck_dev is None:
                    ks, idx, rks = self._ex_np
                    tk, tv, self._ck_log2 = build_cuckoo(ks, idx)
                    rtk, rtv, self._rc_ck_log2 = build_cuckoo(
                        rks, np.zeros(len(rks), np.int32))
                    self._ck_dev = tuple(jnp.asarray(a)
                                         for a in (tk, tv, rtk, rtv))
                (t["ck_tk"], t["ck_tv"],
                 t["rc_ck_tk"], t["rc_ck_tv"]) = self._ck_dev
        return t

    def _tiers_with(self, q, qlen, t, classes: str = "full"):
        """(fwd_tiers, rc_any, tier_hit) from explicit tables, or
        (None, None, all-False) when tiers are disabled.  With
        classes="exact" only the tier-m bucket (fwd[0], rc[0]) is
        meaningful and tier_hit is the fwd tier-m any."""
        B = q.shape[0]
        s = self.spec
        if "ex_keys" not in t:
            return None, None, jnp.zeros((B,), bool)
        ck_f = ((t["ck_tk"], t["ck_tv"], self._ck_log2)
                if "ck_tk" in t else None)
        ck_r = ((t["rc_ck_tk"], t["rc_ck_tv"], self._rc_ck_log2)
                if "rc_ck_tk" in t else None)
        fwd = tier_hits(q, qlen, t["ex_keys"], t["ex_idx"], s.bc_len,
                        s.pad_left, s.pad_right, classes=classes,
                        cuckoo=ck_f)
        rci = jnp.zeros_like(t["ex_idx"])   # rc table has no padding rows
        rc = tier_hits(q, qlen, t["rc_ex_keys"], rci, s.bc_len,
                       s.pad_right, s.pad_left, any_only=True,
                       classes=classes, cuckoo=ck_r)
        if classes == "exact":
            return fwd, rc, fwd[0][0]
        if "bnd" in t:
            # boundary-truncated structures (free core entry/exit at the
            # query edges) are outside the interior classes: flagged
            # rows resolve through the exhaustive DP instead of the tier
            # summaries (any-masking makes need_dp pick them up)
            bt = t["bnd"]
            fl = boundary_flags(q, qlen, bt[0:4], s.bc_len,
                                s.pad_left, s.pad_right)
            fl = fl | boundary_flags(q, qlen, bt[4:8], s.bc_len,
                                     s.pad_right, s.pad_left)
            fl = fl | ((qlen > 0) & (qlen <= s.bc_len + 1))
            keep = ~fl
            fwd = [(a & keep, mlt, ebc, eqp)
                   for (a, mlt, ebc, eqp) in fwd]
            rc = [r & keep for r in rc]
        hit = jnp.zeros((B,), bool)
        for k in range(N_TIERS):
            hit = hit | fwd[k][0] | rc[k]
        return fwd, rc, hit

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

    def match_device_with(self, q, qlen, t, dp: bool = True):
        """Jit-composable match from explicit tables (device_tables()).
        Returns (bc, score, status, umi, qpos).

        dp=False is the fused-step FAST PASS: only the exact (cost-0)
        class is enumerated, and any candidate without a forward tier-m
        hit comes back as DP_PENDING — the streamed CLI resolves those
        post-hoc through the staged standalone matcher
        (pipeline.match_barcodes), so the per-batch device program never
        pays the full-class enumeration or the one-vs-all kernel.
        Verdicts for forward-tier-m rows are final and identical to the
        full match: ties at the best score decide them entirely within
        the tier-m summaries (STAR --outFilterMultimapScoreRange 0), so
        the zeroed lower tiers are never consulted for them."""
        B, Lq = q.shape
        s = self.spec
        if dp:
            fwd, rc, tier_hit = self._tiers_with(q, qlen, t)
            need_dp = (qlen > 0) & ~tier_hit
            dp_res = self._dp_pass(q, qlen, t, need_dp)
            return combine_verdicts(
                q, qlen, s, self.core_len,
                None if fwd is None else (fwd, rc), (need_dp, *dp_res))
        fwd, rc, fwd16_any = self._tiers_with(q, qlen, t, classes="exact")
        if fwd is None:
            pend = qlen > 0
            tiers = None
        else:
            zf = jnp.zeros((B,), bool)
            zsum = (zf, zf, jnp.full((B,), -1, jnp.int32),
                    jnp.full((B,), -1, jnp.int32))
            tiers = ([fwd[0], zsum, zsum], [rc[0], zf, zf])
            pend = (qlen > 0) & ~fwd16_any
        no_dp = (jnp.zeros((B,), bool),
                 jnp.full((B,), NEG, jnp.int32),
                 jnp.full((B,), -1, jnp.int32),
                 jnp.zeros((B,), jnp.int32),
                 jnp.full((B,), NEG, jnp.int32),
                 jnp.full((B,), -1, jnp.int32),
                 jnp.zeros((B,), bool))
        bc, score, status, umi, qpos = combine_verdicts(
            q, qlen, s, self.core_len, tiers, no_dp)
        status = jnp.where(pend, jnp.int32(DP_PENDING), status)
        return bc, score, status, umi, qpos

    def match_device(self, q, qlen):
        """Jit-composable match: returns (bc, score, status, umi, qpos)."""
        return self.match_device_with(q, qlen, self.device_tables())

    # -- staged TPU execution ----------------------------------------------
    #
    # The standalone TPU match is host-orchestrated in three fixed-shape
    # device programs instead of one monolithic jit:
    #   pass1  (B, Lq)   exact-class tier-m summaries, fwd + rc (cheap:
    #                    ~80 keys/candidate, cuckoo probes)
    #   pass2  (C2, Lq)  FULL class enumeration, but only over the rows
    #                    pass1 left unresolved, compacted on host
    #                    (~15-20% of real candidates)
    #   dp     (M, Lq)   one-vs-all exhaustive kernel + per-pair UMI
    #                    rescore for rows with no tier structure at all
    # plus a combine program over the host-assembled summaries.  Results
    # are bit-identical to the in-jit full match (match_device): the
    # escalation rule — a forward tier-m hit decides a row entirely
    # within tier m — is exactly STAR's tie-at-best semantics.
    PASS2_CHUNK = 1024

    def _staged_fn(self, kind: str, shape):
        fns = getattr(self, "_staged", None)
        if fns is None:
            fns = self._staged = {}
        key = (kind, shape)
        if key in fns:
            return fns[key]
        s = self.spec

        if kind == "p1":
            @jax.jit
            def fn(q, qlen, t):
                fwd, rc, _ = self._tiers_with(q, qlen, t, classes="exact")
                return (*fwd[0], rc[0])
        elif kind == "p2":
            @jax.jit
            def fn(q, qlen, t):
                fwd, rc, hit = self._tiers_with(q, qlen, t)
                flat = []
                for k in range(N_TIERS):
                    flat.extend(fwd[k])
                return (*flat, *rc, hit)
        elif kind == "dp":
            @jax.jit
            def fn(q, qlen, t):
                M = q.shape[0]
                qrc = revcomp_rows(q, qlen)
                qq = jnp.concatenate([q, qrc], axis=0)
                qql = jnp.concatenate([qlen, qlen])
                best, idx, ties = verify_all(qq, qql, t["coreT"],
                                             len(self.barcodes),
                                             s.pad_left, s.pad_right)
                fic = idx[:M]
                refs = t["refs"]
                ref_rows = refs[jnp.clip(fic, 0, refs.shape[0] - 1)]
                banded = jax.default_backend() != "cpu"
                _, qp, uv = sw_end2end(
                    q, qlen, ref_rows,
                    jnp.full((M,), self.ref_len, jnp.int32),
                    s.umi_ref_offset,
                    pad_left=s.pad_left if banded else None,
                    full_len=self.ref_len if banded else None)
                return best[:M], fic, ties[:M], best[M:], qp, uv
        elif kind == "comb":
            @jax.jit
            def fn(q, qlen, tA, tM, tE, tQ, tR, need, fb, fidx, fties,
                   rb, fqpos, fuval):
                fwd = [(tA[k], tM[k], tE[k], tQ[k])
                       for k in range(N_TIERS)]
                rc = [tR[k] for k in range(N_TIERS)]
                return combine_verdicts(
                    q, qlen, s, self.core_len, (fwd, rc),
                    (need, fb, fidx, fties, rb, fqpos, fuval))
        else:
            raise ValueError(kind)
        fns[key] = fn
        return fn

    def _match_tpu(self, q: np.ndarray, qlen: np.ndarray):
        """Staged standalone match (TPU): pass1 → compacted pass2 →
        compacted DP → combine.  Exact results, but the expensive
        passes touch only the rows that need them."""
        B, Lq = q.shape
        s = self.spec
        t = self.device_tables()
        qd = jnp.asarray(q)
        qld = jnp.asarray(qlen)
        a16, m16, e16, p16, r16 = (np.asarray(x) for x in self._staged_fn(
            "p1", (B, Lq))(qd, qld, t))
        tA = np.zeros((N_TIERS, B), bool)
        tM = np.zeros((N_TIERS, B), bool)
        tE = np.full((N_TIERS, B), -1, np.int32)
        tQ = np.full((N_TIERS, B), -1, np.int32)
        tR = np.zeros((N_TIERS, B), bool)
        tA[0], tM[0], tE[0], tQ[0], tR[0] = a16, m16, e16, p16, r16
        need = np.zeros(B, bool)
        fb = np.full(B, NEG, np.int32)
        fidx = np.full(B, -1, np.int32)
        fties = np.zeros(B, np.int32)
        rb = np.full(B, NEG, np.int32)
        fqpos = np.full(B, -1, np.int32)
        fuval = np.zeros(B, bool)

        unres = np.where((qlen > 0) & ~a16)[0]
        C2 = self.PASS2_CHUNK
        for base in range(0, len(unres), C2):
            rows = unres[base:base + C2]
            qc = np.zeros((C2, Lq), q.dtype)
            qlc = np.zeros(C2, np.int32)
            qc[:len(rows)] = q[rows]
            qlc[:len(rows)] = qlen[rows]
            out = [np.asarray(x) for x in self._staged_fn(
                "p2", (C2, Lq))(jnp.asarray(qc), jnp.asarray(qlc), t)]
            for k in range(N_TIERS):
                tA[k, rows] = out[4 * k][:len(rows)]
                tM[k, rows] = out[4 * k + 1][:len(rows)]
                tE[k, rows] = out[4 * k + 2][:len(rows)]
                tQ[k, rows] = out[4 * k + 3][:len(rows)]
                tR[k, rows] = out[4 * N_TIERS + k][:len(rows)]
            hit = out[5 * N_TIERS][:len(rows)]
            need[rows] = ~hit

        flagged = np.where(need)[0]
        M = self.dp_chunk
        for base in range(0, len(flagged), M):
            rows = flagged[base:base + M]
            qc = np.zeros((M, Lq), q.dtype)
            qlc = np.zeros(M, np.int32)
            qc[:len(rows)] = q[rows]
            qlc[:len(rows)] = qlen[rows]
            out = [np.asarray(x) for x in self._staged_fn(
                "dp", (M, Lq))(jnp.asarray(qc), jnp.asarray(qlc), t)]
            n = len(rows)
            fb[rows], fidx[rows], fties[rows] = (
                out[0][:n], out[1][:n], out[2][:n])
            rb[rows], fqpos[rows], fuval[rows] = (
                out[3][:n], out[4][:n], out[5][:n])

        bc, score, status, umi, qpos = self._staged_fn("comb", (B, Lq))(
            qd, qld, jnp.asarray(tA), jnp.asarray(tM), jnp.asarray(tE),
            jnp.asarray(tQ), jnp.asarray(tR), jnp.asarray(need),
            jnp.asarray(fb), jnp.asarray(fidx), jnp.asarray(fties),
            jnp.asarray(rb), jnp.asarray(fqpos), jnp.asarray(fuval))
        return {"bc_idx": np.asarray(bc), "score": np.asarray(score),
                "status": np.asarray(status), "umi": np.asarray(umi),
                "qpos": np.asarray(qpos)}

    def enable_aot(self, batch: int, Lq: int, log=None):
        """AOT-cache the staged standalone-match programs for
        (batch, Lq) inputs (runtime/aot_cache.py). Idempotent;
        thread-safe; no-op on CPU or with NANORANGER_AOT=0."""
        import os as _os
        if (jax.default_backend() == "cpu" or
                _os.environ.get("NANORANGER_AOT", "") == "0"):
            return
        if self._ex_np is None:       # slideseq-style: in-jit DP match
            return
        with self._aot_lock:
            if self._aot_shape == (batch, Lq):
                return
            from ..runtime.aot_cache import get_or_compile
            t = self.device_tables()
            s = self.spec
            base_extra = (s.umi_ref_offset, s.umi_len, s.as_min, s.bc_len,
                          self.dp_chunk, int(len(self.barcodes)),
                          self.ref_len, "staged_v5")
            fns = getattr(self, "_staged", None)
            if fns is None:
                fns = self._staged = {}
            C2, M = self.PASS2_CHUNK, self.dp_chunk

            def ex(shape):
                return (np.zeros(shape, np.int8),
                        np.zeros(shape[0], np.int32), t)

            fns[("p1", (batch, Lq))] = get_or_compile(
                "match_p1", self._staged_fn("p1", None), ex((batch, Lq)),
                base_extra + (batch,), log=log)
            fns[("p2", (C2, Lq))] = get_or_compile(
                "match_p2", self._staged_fn("p2", None), ex((C2, Lq)),
                base_extra + (C2,), log=log)
            fns[("dp", (M, Lq))] = get_or_compile(
                "match_dp", self._staged_fn("dp", None), ex((M, Lq)),
                base_extra + (M,), log=log)
            NB = N_TIERS
            comb_ex = (np.zeros((batch, Lq), np.int8),
                       np.zeros(batch, np.int32),
                       np.zeros((NB, batch), bool),
                       np.zeros((NB, batch), bool),
                       np.zeros((NB, batch), np.int32),
                       np.zeros((NB, batch), np.int32),
                       np.zeros((NB, batch), bool),
                       np.zeros(batch, bool),
                       np.zeros(batch, np.int32),
                       np.zeros(batch, np.int32),
                       np.zeros(batch, np.int32),
                       np.zeros(batch, np.int32),
                       np.zeros(batch, np.int32),
                       np.zeros(batch, bool))
            fns[("comb", (batch, Lq))] = get_or_compile(
                "match_comb", self._staged_fn("comb", None), comb_ex,
                base_extra + ("comb",), log=log)
            self._aot_shape = (batch, Lq)

    # -- host-orchestrated CPU path -----------------------------------------

    def _tier_fn_for(self, shape):
        if getattr(self, "_tier_fn", None) is None or \
                self._tier_shape != shape:

            @jax.jit
            def fn(q, qlen, tt):
                return self._tiers_with(q, qlen, tt)

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
        t = self.device_tables()
        fwd, rc, tier_hit = self._tier_fn_for(q.shape)(
            jnp.asarray(q), jnp.asarray(qlen), t)
        tier_hit = np.asarray(tier_hit)
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
            jnp.asarray(q), jnp.asarray(qlen), s, self.core_len,
            None if fwd is None else (fwd, rc),
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
        if self._ex_np is not None:
            return self._match_tpu(np.asarray(q),
                                   np.asarray(qlen, np.int32))
        # no tier tables (slideseq 32-char structure): in-jit DP match
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


# streamed-CLI sentinel: tier passes could not resolve the row and the
# fused step ran with dp=False — pipeline.match_barcodes re-matches it
DP_PENDING = 7
