"""Product-structure whitelist screen: distinct-half matmuls + pair table.

10x barcode whitelists are combinatorial products: 737K-august-2016 has
only 1920 distinct first halves and 1536 distinct second halves. The
gather-based bucket screen (ops/seed_screen.py) pays ~500-entry bucket
gathers per (read, offset); here we instead compute, with two small
one-hot MXU matmuls, each read's full mismatch profile against EVERY
distinct half key, take the top-T half keys per side, and join them
through a dense (n1, n2) pair → barcode-id table. Cost per batch is two
(B·O, 32) @ (32, n_distinct) matmuls + two top_k + B·T² tiny gathers —
no large gathers at all.

Recall argument: an accepted barcode (<=1 edit, AS>=14) has mm<=1 on each
half at some searched offset (offset jitter covers indels), so its half
keys rank in the per-side top-T (T=8 default) unless 8+ distinct keys tie
closer — not possible with mm<=1 vs mm>=? competitors; the exact DP
rescorer then arbitrates. Non-product or huge whitelists (pair table
> PAIR_LIMIT) fall back to the bucket screen automatically.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

PAIR_LIMIT = 32_000_000  # max dense pair-table entries (128MB int32)


@dataclasses.dataclass
class ProductTable:
    """Host-built arrays for the product screen."""
    n1: int
    n2: int
    planes1: np.ndarray      # (32 or 4*l1, n1) int8 one-hot of distinct half1
    planes2: np.ndarray
    pair: np.ndarray         # (n1, n2) int32 bc index or -1
    l1: int
    l2: int
    q_delta2: int            # query offset of half2 start minus half1 start

    @classmethod
    def build(cls, bc_codes: np.ndarray, half_bounds, q_deltas):
        (lo1, hi1), (lo2, hi2) = half_bounds
        l1, l2 = hi1 - lo1, hi2 - lo2
        k1 = _pack(bc_codes[:, lo1:hi1])
        k2 = _pack(bc_codes[:, lo2:hi2])
        u1, inv1 = np.unique(k1, return_inverse=True)
        u2, inv2 = np.unique(k2, return_inverse=True)
        if len(u1) * len(u2) > PAIR_LIMIT:
            return None
        pair = np.full((len(u1), len(u2)), -1, np.int32)
        pair[inv1, inv2] = np.arange(len(bc_codes), dtype=np.int32)
        return cls(len(u1), len(u2),
                   _onehot_planes(u1, l1), _onehot_planes(u2, l2),
                   pair, l1, l2, q_deltas[1] - q_deltas[0])

    # quarter planes (prefix/suffix split) for the indel-tolerant profile
    def split_planes(self):
        if not hasattr(self, "_split"):
            self._split = {}
            for side, (planes, l) in enumerate(
                    [(self.planes1, self.l1), (self.planes2, self.l2)]):
                h = l // 2
                self._split[side] = (planes[: 4 * h], planes[4 * h:], h)
        return self._split


def _pack(codes: np.ndarray) -> np.ndarray:
    keys = np.zeros(codes.shape[0], np.int64)
    for t in range(codes.shape[1]):
        keys = keys * 4 + codes[:, t].astype(np.int64)
    return keys


def _onehot_planes(keys: np.ndarray, l: int) -> np.ndarray:
    """(4*l, n) int8: row 4*t+base is 1 where key's base at position t
    equals base."""
    n = len(keys)
    out = np.zeros((4 * l, n), np.int8)
    for t in range(l):
        base = (keys >> (2 * (l - 1 - t))) & 3
        out[4 * t + base, np.arange(n)] = 1
    return out


def _query_onehot(q: jnp.ndarray, offsets, l: int):
    """(B, O, 4l) int8 one-hot windows of q at the given offsets (invalid
    bases → zero rows)."""
    B, Lq = q.shape
    cols = []
    for o in offsets:
        w = jax.lax.dynamic_slice_in_dim(
            jnp.pad(q, ((0, 0), (0, l + max(offsets) + 8)),
                    constant_values=5),
            o, l, axis=1) if o >= 0 else jnp.full((B, l), 5, q.dtype)
        cols.append(w)
    win = jnp.stack(cols, axis=1)                  # (B, O, l)
    oh = (win[:, :, :, None] ==
          jnp.arange(4, dtype=win.dtype)[None, None, None, :])
    return oh.reshape(B, len(offsets), 4 * l).astype(jnp.int8)


@functools.partial(jax.jit,
                   static_argnames=("nominal", "jitter", "q_delta2", "l1",
                                    "l2", "top_t", "top_k"))
def product_screen(q, qlen, planes1, planes2, pair, nominal, jitter,
                   q_delta2, l1, l2, top_t=8, top_k=8):
    """Candidates via the product screen.

    Per-side profile = max over offsets of
      max(full ungapped matches,
          prefix-quarter matches + best suffix-quarter matches at ±1 shift)
    — the split term keeps indel-inside-half barcodes competitive.

    Returns (cand (B, top_k) int32 [-1 none], cheap (B, top_k) matched-base
    counts)."""
    B = q.shape[0]
    q = q.astype(jnp.int8)
    offs1 = [nominal + d for d in range(-jitter, jitter + 1)]
    offs2 = [nominal + q_delta2 + d for d in range(-jitter, jitter + 1)]

    def matmul(oh, planes, n_off):
        m = jax.lax.dot_general(
            oh.reshape(B * n_off, -1), planes, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return m.reshape(B, n_off, -1)

    def offs_ok(offs, l):
        return jnp.stack([(o >= 0) & ((jnp.int32(o) + l) <= qlen)
                          for o in offs], axis=1)   # (B, O)

    def side(planes, offs, l):
        O = len(offs)
        h = l // 2
        m_full = matmul(_query_onehot(q, offs, l), planes, O)
        m_pre = matmul(_query_onehot(q, offs, h), planes[: 4 * h], O)
        offs_s = [offs[0] + h - 1 + d for d in range(O + 2)]
        m_suf = matmul(_query_onehot(q, offs_s, l - h), planes[4 * h:],
                       O + 2)
        # best suffix at shifts -1/0/+1 relative to each prefix offset
        smax = jnp.maximum(jnp.maximum(m_suf[:, 0:O], m_suf[:, 1:O + 1]),
                           m_suf[:, 2:O + 2])
        m = jnp.maximum(m_full, m_pre + smax)
        ok = offs_ok(offs, l)[:, :, None]
        m = jnp.where(ok, m, 0)
        mf = jnp.where(ok, m_full, 0)
        # profile (indel-tolerant) + pure ungapped max (exactness signal)
        return jnp.max(m, axis=1), jnp.max(mf, axis=1)

    m1, f1 = side(planes1, offs1, l1)
    m2, f2 = side(planes2, offs2, l2)
    top_t = min(top_t, m1.shape[1], m2.shape[1])    # tiny whitelists
    # T×T pairs rank by the PURE ungapped profile (substitution cases);
    # indel cases ride the partner expansion below — the split term would
    # otherwise inflate random keys and crowd the top-T
    v1, i1 = jax.lax.top_k(f1, top_t)               # (B, T)
    v2, i2 = jax.lax.top_k(f2, top_t)

    # all T×T pairs through the dense pair table
    ii1 = jnp.repeat(i1, top_t, axis=1)             # (B, T²)
    ii2 = jnp.tile(i2, (1, top_t))
    vv1 = [jnp.repeat(v1, top_t, axis=1)]
    vv2 = [jnp.tile(v2, (1, top_t))]
    ii1 = [ii1]
    ii2 = [ii2]

    # partner expansion — the exact-bucket equivalent: an accepted barcode
    # has at least one EXACT half (pigeonhole); its bucket = the pair-table
    # row/column of that key. For the top-E exact-ranked keys per side,
    # fetch validity via one-hot matmul and keep the top-RK partners by the
    # other side's (indel-tolerant) profile. This reproduces the gather
    # screen's candidate set without large gathers.
    pv = (pair >= 0).astype(jnp.int8)
    n1, n2 = pv.shape
    E, RK = min(4, n1, n2), min(12, n1, n2)
    e1v, e1i = jax.lax.top_k(f1, E)
    e2v, e2i = jax.lax.top_k(f2, E)
    for e in range(E):
        oh1 = jax.nn.one_hot(e1i[:, e], n1, dtype=jnp.int8)
        row_ok = jax.lax.dot_general(oh1, pv, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32) > 0
        r2v, r2i = jax.lax.top_k(jnp.where(row_ok, m2, -1), RK)
        ii1.append(jnp.repeat(e1i[:, e:e + 1], RK, axis=1))
        ii2.append(r2i)
        vv1.append(jnp.repeat(e1v[:, e:e + 1], RK, axis=1))
        vv2.append(r2v)
        oh2 = jax.nn.one_hot(e2i[:, e], n2, dtype=jnp.int8)
        col_ok = jax.lax.dot_general(oh2, pv.T, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32) > 0
        r1v, r1i = jax.lax.top_k(jnp.where(col_ok, m1, -1), RK)
        ii1.append(r1i)
        ii2.append(jnp.repeat(e2i[:, e:e + 1], RK, axis=1))
        vv1.append(r1v)
        vv2.append(jnp.repeat(e2v[:, e:e + 1], RK, axis=1))

    ii1 = jnp.concatenate(ii1, axis=1)
    ii2 = jnp.concatenate(ii2, axis=1)
    cand = pair[ii1, ii2]                           # (B, pool) gather (tiny)
    cheap = jnp.concatenate(vv1, axis=1) + jnp.concatenate(vv2, axis=1)
    cheap = jnp.where(cand >= 0, cheap, -1)
    topc, topi = jax.lax.top_k(cheap, top_k)
    top_bc = jnp.take_along_axis(cand, topi, axis=1)
    top_bc = jnp.where(topc >= 0, top_bc, -1)
    return top_bc, topc


@functools.partial(jax.jit,
                   static_argnames=("lo", "hi", "q_delta2", "l1", "l2",
                                    "top_w", "min_joint", "chunk"))
def product_screen_joint(q, qlen, planes1, planes2, pair, lo, hi,
                         q_delta2, l1, l2, top_w=8, min_joint=None,
                         chunk=16):
    """Wide-offset screen: rank half-PAIRS jointly per offset.

    The per-side top-T of product_screen breaks down over a wide offset
    range: spurious full-match halves at random offsets crowd out a true
    barcode's 7/8-match half (observed when naively widening jitter).
    Here each offset o in [lo, hi] contributes its top-2 halves PER SIDE
    at that exact offset, joined through the pair table — a spurious
    joint hit needs BOTH halves matching at a consistent spacing AND a
    real barcode pairing them, which is rare. The global top_w pairs
    across offsets feed the exact DP rescorer.

    Catches >= as_min alignments ANYWHERE the N pads allow (round-4
    match_parity: accepted-vs-dropped flips from 14/15-scoring loci
    outside the nominal +-jitter window). min_joint (default l1+l2-2
    = 14 ungapped matches) filters noise. Offsets process in chunked
    BATCHED matmuls — a per-offset lax.scan was latency-bound (~1 ms x
    70 sequential steps halved the fused-step throughput)."""
    B, Lq = q.shape
    if min_joint is None:
        min_joint = l1 + l2 - 2
    offsets = list(range(lo, hi + 1))
    all_v, all_bc = [], []
    for cs in range(0, len(offsets), chunk):
        offs = offsets[cs:cs + chunk]
        O = len(offs)
        oh1 = _query_onehot(q, offs, l1)                   # (B, O, 4*l1)
        m1 = jax.lax.dot_general(
            oh1.reshape(B * O, -1), planes1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)              # (B*O, n1)
        oh2 = _query_onehot(q, [o + q_delta2 for o in offs], l2)
        m2 = jax.lax.dot_general(
            oh2.reshape(B * O, -1), planes2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        # top-2 via two max/argmax reductions: lax.top_k over (B*O, n)
        # rows is sort-based and dominated this screen's runtime
        def top2(m):
            v_a = jnp.max(m, axis=1)
            i_a = jnp.argmax(m, axis=1).astype(jnp.int32)
            masked = jnp.where(
                jnp.arange(m.shape[1], dtype=jnp.int32)[None, :]
                == i_a[:, None], -(1 << 20), m)
            v_b = jnp.max(masked, axis=1)
            i_b = jnp.argmax(masked, axis=1).astype(jnp.int32)
            return (jnp.stack([v_a, v_b], axis=1),
                    jnp.stack([i_a, i_b], axis=1))

        v1, i1 = top2(m1)                                  # (B*O, 2)
        v2, i2 = top2(m2)
        cb = pair[i1[:, :, None], i2[:, None, :]]          # (B*O, 2, 2)
        jv = v1[:, :, None] + v2[:, None, :]
        feas = (jnp.asarray(offs, jnp.int32)[None, :] + q_delta2 + l2
                <= qlen[:, None])                          # (B, O)
        jv = jnp.where((cb >= 0) & feas.reshape(B * O, 1, 1)
                       & (jv >= min_joint), jv, -1)
        all_v.append(jv.reshape(B, O * 4))
        all_bc.append(cb.reshape(B, O * 4))
    cat_v = jnp.concatenate(all_v, axis=1)
    cat_bc = jnp.concatenate(all_bc, axis=1)
    # (v desc, bc asc) selection — identical tie-break to the previous
    # scan-merge implementation, so candidate sets (and goldens) match
    sv, sbc = jax.lax.sort((-cat_v, cat_bc), dimension=1, num_keys=1)
    best_v = -sv[:, :top_w]
    best_bc = jnp.where(best_v >= 0, sbc[:, :top_w], -1)
    return best_bc, best_v
