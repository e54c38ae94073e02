"""Base-level extension of chain ends (minimap2's extension DP analogue).

The seed-chain aligner's qstart/qend/tstart/tend come from terminal
minimizer anchors, a ±~w(=10nt) drift from minimap2's base-exact spans
(reference scripts/align_trns.sh:9 semantics). This kernel refines them:
for each record end, the query flank beyond the terminal anchor is
DP-aligned against the reference flank with FREE far ends, and the
max-scoring cell gives the (query, target) extension lengths. Scoring is
minimap2 map-ont-flavored (match 2, mismatch -4, gap -4 linear); flanks
are short (F<=48) so one jitted antidiagonal-free row scan over all
record-ends at once is cheap on either backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MATCH = 2
MIS = -4
GAP = -4
F_EXT = 48         # flank length examined beyond each terminal anchor
NEGI = -(1 << 20)


@functools.partial(jax.jit, static_argnames=("F",))
def extend_scores(q, qlen, t, tlen, F=F_EXT):
    """q, t: (N, F) int8 flanks oriented AWAY from the chain end (position
    0 adjoins the terminal anchor). qlen/tlen: valid lengths.
    Returns (q_ext, t_ext): per row, the (i, j) of the max-scoring DP cell
    — #query / #target bases the alignment extends. Ties prefer smaller
    i+j then smaller i (deterministic; a zero-length extension scores 0,
    so extension happens only when bases actually align)."""
    N = q.shape[0]
    jj = jnp.arange(F + 1, dtype=jnp.int32)[None, :]
    t_ok = jj[:, 1:] <= tlen[:, None]          # (N, F) col j valid
    row0 = jnp.where(jj <= tlen[:, None], GAP * jj, NEGI)   # H[0, :]

    def step(carry, i):
        row, best, bi, bj = carry
        qi = q[:, i - 1][:, None]                           # (N,1)
        sub = jnp.where((qi == t[:, : F]) & (qi < 4) & (qi >= 0),
                        MATCH, MIS)
        diag = row[:, :-1] + sub                            # H[i-1,j-1]+s
        up = row[:, 1:] + GAP                               # H[i-1,j]+g
        new = jnp.maximum(diag, up)
        # left-gap prefix scan: H[i,j] = max(new[j], H[i,j-1]+GAP) —
        # running max of (new[j] - GAP*j) + GAP*j
        head = jnp.where(i <= qlen, GAP * i, NEGI)[:, None]  # H[i,0]
        shifted = jnp.concatenate([head, new], axis=1)      # (N, F+1)
        m = jax.lax.associative_scan(jnp.maximum,
                                     shifted - GAP * jj, axis=1)
        rowi = m + GAP * jj
        rowi = jnp.where((jj <= tlen[:, None]) & (i <= qlen[:, None]),
                         rowi, NEGI)
        # track the best cell (score desc, i+j asc, i asc)
        rbest = jnp.max(rowi, axis=1)
        rj = jnp.argmax(rowi == rbest[:, None], axis=1)     # first j
        better = (rbest > best)
        best = jnp.where(better, rbest, best)
        bi = jnp.where(better, i, bi)
        bj = jnp.where(better, rj.astype(jnp.int32), bj)
        return (rowi, best, bi, bj), None

    init = (row0,
            jnp.zeros(N, jnp.int32),        # H[0,0] = 0 baseline
            jnp.zeros(N, jnp.int32),
            jnp.zeros(N, jnp.int32))
    (_, best, bi, bj), _ = jax.lax.scan(
        step, init, jnp.arange(1, F + 1, dtype=jnp.int32))
    return bi, bj


def extend_records_host(rec, index, codes, lengths, F: int = F_EXT,
                        max_rounds: int = 4, min_bucket: int = 0):
    """Refine record spans in place; returns per-record (ql, tl, qr, tr)
    total extension amounts (stored-orientation left/right). codes: (B, L)
    int8 original reads; rec fields are updated in place.

    Iterative: terminal-anchor drift can exceed one flank when errors
    thin the minimizers near a read end, so ends whose extension hits the
    flank cap re-extend from the new boundary (Z-drop analogue: each
    round must independently gain score). max_rounds*F bounds the total
    drift covered (4*48nt ≫ any realistic anchor drift) and the per-batch
    device dispatches."""
    from ..io.encode import COMPLEMENT
    R = len(rec)
    if R == 0:
        return np.zeros((0, 4), np.int32)
    rlen = lengths[rec.read_idx].astype(np.int64)
    sqs = np.where(rec.strand == 1, rlen - rec.qend, rec.qstart).astype(np.int64)
    sqe = np.where(rec.strand == 1, rlen - rec.qstart, rec.qend).astype(np.int64)
    tstart = rec.tstart.astype(np.int64).copy()
    tend = rec.tend.astype(np.int64).copy()
    total = np.zeros((R, 4), np.int64)

    stored_cache: dict = {}

    def stored_of(r):
        key = (int(rec.read_idx[r]), int(rec.strand[r]))
        s = stored_cache.get(key)
        if s is None:
            i, n = key[0], int(rlen[r])
            s = codes[i, :n]
            if key[1] == 1:
                s = COMPLEMENT[s][::-1]
            stored_cache[key] = s
        return s

    active = np.arange(R)
    for _ in range(max_rounds):
        n_act = len(active)
        if n_act == 0:
            break
        # pow2 bucket: stable jit shapes. min_bucket pins the bucket so
        # every round (and every caller passing the same value) hits ONE
        # compiled shape — the deferred-read fallback prewarms it.
        Nb = max(256, min_bucket)
        while Nb < 2 * n_act:
            Nb *= 2
        qf = np.zeros((Nb, F), np.int8) - 1
        tf = np.zeros((Nb, F), np.int8) - 1
        qn = np.zeros(Nb, np.int32)
        tn = np.zeros(Nb, np.int32)
        for k, r in enumerate(active):
            stored = stored_of(r)
            ref = index.seq_codes[int(rec.ref_id[r])]
            # left end: away-from-chain = toward read start / ref start
            lo_q = stored[max(int(sqs[r]) - F, 0): int(sqs[r])][::-1]
            lo_t = ref[max(int(tstart[r]) - F, 0): int(tstart[r])][::-1]
            qf[2 * k, :len(lo_q)] = lo_q
            tf[2 * k, :len(lo_t)] = lo_t
            qn[2 * k], tn[2 * k] = len(lo_q), len(lo_t)
            # right end: toward read end / ref end
            hi_q = stored[int(sqe[r]): int(sqe[r]) + F]
            hi_t = ref[int(tend[r]): int(tend[r]) + F]
            qf[2 * k + 1, :len(hi_q)] = hi_q
            tf[2 * k + 1, :len(hi_t)] = hi_t
            qn[2 * k + 1], tn[2 * k + 1] = len(hi_q), len(hi_t)

        qi, tj = extend_scores(jnp.asarray(qf), jnp.asarray(qn),
                               jnp.asarray(tf), jnp.asarray(tn), F=F)
        qi = np.asarray(qi)[: 2 * n_act].reshape(n_act, 2).astype(np.int64)
        tj = np.asarray(tj)[: 2 * n_act].reshape(n_act, 2).astype(np.int64)

        sqs[active] -= qi[:, 0]
        sqe[active] += qi[:, 1]
        tstart[active] -= tj[:, 0]
        tend[active] += tj[:, 1]
        total[active, 0] += qi[:, 0]
        total[active, 1] += tj[:, 0]
        total[active, 2] += qi[:, 1]
        total[active, 3] += tj[:, 1]
        # an end that consumed (nearly) the whole flank may still have
        # drift left — re-extend those records from the new boundary
        capped = ((qi >= F - 4) | (tj >= F - 4)).any(axis=1) & \
            ((qi + tj).sum(axis=1) > 0)
        active = active[capped]

    rec.tstart = tstart
    rec.tend = tend
    rec.qstart = np.where(rec.strand == 1, rlen - sqe, sqs)
    rec.qend = np.where(rec.strand == 1, rlen - sqs, sqe)
    return total
