"""Exact end-to-end alignment scoring of BC-UMI candidates vs padded
whitelist references — the STAR-replacement rescorer.

Replicates the scoring model of the reference's STAR invocation
(scripts/barcode_align.sh:14-35):
  --alignEndsType EndToEnd      → query globally aligned (no soft clip)
  free reference flanks          → alignment may start/end anywhere in ref
  match +1 / mismatch -1         → STAR defaults
  ref 'N' scores 0 vs any base   → the pad trick (README.md:22); query N
                                    is also scored 0 (reads rarely carry N)
  --scoreDelOpen 0 --scoreDelBase -1 / Ins likewise → linear gap cost 1
The resulting maximum is STAR's AS tag, thresholded by process_matching_*
(AS>=14 or >=30, utils.py:699,638) with unique-best enforcement
(--outFilterMultimapScoreRange 0 ⇒ score ties across barcodes are dropped).

UMI extraction replicates utils.py:705-708: the query index aligned
(diagonally) to padded-ref position `c` on an optimal path; if `c` is not
covered by a match/mismatch column (deletion or out of alignment span) the
reference's dict lookup raises and the read yields umi='N' — here `valid`
goes False.

TPU formulation: DP runs column-by-column over the reference axis; the
within-column (query-insertion) dependence collapses to a prefix max
(linear gap cost), so each column is elementwise VPU work + one cummax —
batched over all (candidate, barcode) pairs. A forward and a backward pass
plus snapshot columns at `c` give the aligned-pair query position without
any traceback storage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io.encode import N as N_CODE
from ..io.encode import PAD as PAD_CODE

NEG = np.int32(-(1 << 20))  # np not jnp: avoid backend init at import


def _sub_scores(q_col, r_char):
    """Match/mismatch score of query bases (P, Lq) against ref char (P, 1)."""
    neutral = (r_char == N_CODE) | (q_col == N_CODE)
    s = jnp.where(q_col == r_char, 1, -1)
    s = jnp.where(neutral, 0, s)
    # PAD query rows never participate (rows are masked by qlen at readout,
    # but keep their scores harmless):
    return jnp.where((q_col == PAD_CODE) | (r_char == PAD_CODE), -1, s)


def sw_end2end(query, qlen, refs, rlen, umi_ref_offset: int,
               pad_left: int | None = None,
               full_len: int | None = None):
    """Dispatch: fused Pallas kernel on TPU (ops/pallas_sw.py), XLA scans
    on CPU. The Pallas path assumes uniform ref length == refs.shape[1]
    (true for every whitelist: pads are fixed per chemistry).

    pad_left (when given) asserts the padded-whitelist structure
    N*pad_left + core + N*(Lr - umi_ref_offset): the TPU path then runs the
    exact banded kernel over core columns only (~5x less sequential DP; N
    columns have closed forms — see pallas_sw._sw_banded_kernel)."""
    import jax as _jax
    if _jax.default_backend() != "cpu":
        if pad_left is not None:
            from .pallas_sw import sw_end2end_banded_pallas
            return sw_end2end_banded_pallas(
                query, qlen, refs,
                int(full_len if full_len is not None else refs.shape[1]),
                umi_ref_offset, pad_left, interpret=False)
        from .pallas_sw import sw_end2end_pallas
        return sw_end2end_pallas(query, qlen, refs, rlen, umi_ref_offset,
                                 interpret=False)
    return sw_end2end_xla(query, qlen, refs, rlen, umi_ref_offset)


@functools.partial(jax.jit, static_argnames=("umi_ref_offset",))
def sw_end2end_xla(query: jnp.ndarray, qlen: jnp.ndarray, refs: jnp.ndarray,
                   rlen: jnp.ndarray, umi_ref_offset: int):
    """Score query[i] vs refs[i] end-to-end and locate the UMI query index.

    Args:
      query: (P, Lq) int8 codes, PAD-padded.
      qlen:  (P,) int32.
      refs:  (P, Lr) int8 codes (padded whitelist rows; PAD beyond rlen).
      rlen:  (P,) int32 valid ref lengths.
      umi_ref_offset: 0-based reference position whose aligned query base
        starts the UMI (BarcodeMatchSpec.umi_ref_offset).

    Returns (score, qpos, valid):
      score: (P,) int32 best end-to-end score (STAR AS equivalent).
      qpos:  (P,) int32 query index aligned to ref position umi_ref_offset
             on an optimal path (smallest such index), -1 if none.
      valid: (P,) bool — ref position is diagonally aligned on an optimal path.
    """
    query = query.astype(jnp.int32)
    refs = refs.astype(jnp.int32)
    P, Lq = query.shape
    Lr = refs.shape[1]
    c = umi_ref_offset

    ii = jnp.arange(Lq + 1, dtype=jnp.int32)[None, :]
    row_valid = ii <= qlen[:, None]

    def fwd_col(col_prev, j):
        r_char = jax.lax.dynamic_slice_in_dim(refs, j, 1, axis=1)
        s = _sub_scores(query, r_char)
        diag = col_prev[:, :-1] + s                      # i-1 -> i, consume ref
        horiz = col_prev[:, 1:] - 1                      # ref deletion
        t = jnp.maximum(diag, horiz)
        t = jnp.concatenate([jnp.zeros((P, 1), jnp.int32), t], axis=1)  # row 0 free
        col = jax.lax.cummax(t + ii, axis=1) - ii        # query insertions
        # columns beyond this pair's ref length must not contribute
        live = j < rlen[:, None]
        col = jnp.where(live, col, NEG)
        return col, None

    col0 = -ii * jnp.ones((P, 1), jnp.int32)             # F[i][0] = -i

    def scan_fwd(col, j):
        col_new, _ = fwd_col(col, j)
        end_val = jnp.take_along_axis(col_new, qlen[:, None], axis=1)[:, 0]
        snap = jnp.where(j == c, col, jnp.zeros_like(col))  # F[:, j==c] BEFORE col c+1... see below
        return col_new, (end_val, snap)

    # Forward: scan columns j = 0..Lr-1 producing F columns 1..Lr.
    # We need F at DP column c (i.e. after consuming c ref bases) — that is
    # the carry *entering* iteration j == c.
    js = jnp.arange(Lr, dtype=jnp.int32)
    col_final, (end_vals, snaps) = jax.lax.scan(scan_fwd, col0, js)
    # best over DP columns 1..Lr plus column 0 (empty-ref corner is only
    # relevant for empty queries — excluded).
    end0 = jnp.take_along_axis(col0, qlen[:, None], axis=1)[:, 0]
    score = jnp.maximum(jnp.max(end_vals, axis=0), end0)

    F_c = snaps.sum(axis=0)                              # (P, Lq+1) = F[:, c]

    # Backward pass: B[i][j] = best completion from (i, j).
    # B[qlen][j] = 0; B[i][Lr_pair] = -(qlen - i); mirror transitions.
    def bwd_col(col_next, j):
        r_char = jax.lax.dynamic_slice_in_dim(refs, j, 1, axis=1)
        s = _sub_scores(query, r_char)
        diag = col_next[:, 1:] + s                       # consume q[i], r[j]
        horiz = col_next[:, :-1] - 1                     # ref deletion
        t = jnp.maximum(diag, horiz)
        # row qlen free-suffix boundary: B[qlen][j] = 0 — enforced after
        # suffix-scan via masking; append boundary at i = Lq
        t = jnp.concatenate([t, jnp.full((P, 1), NEG, jnp.int32)], axis=1)
        t = jnp.where(ii == qlen[:, None], 0, t)
        t = jnp.where(ii > qlen[:, None], NEG, t)  # pad rows must not leak
                                                   # into the suffix max
        # query insertions go downward: B[i][j] >= B[i+1][j] - 1 → suffix max
        rev = t[:, ::-1]
        col = (jax.lax.cummax(rev + ii, axis=1) - ii)[:, ::-1]
        live = j < rlen[:, None]
        col = jnp.where(live, col, NEG)
        # dead columns (j >= rlen) should behave like the terminal column:
        colT = -(qlen[:, None] - ii)
        colT = jnp.where(row_valid, colT, NEG)
        col = jnp.where(live, col, colT)
        return col, col

    colT = -(qlen[:, None] - ii)
    colT = jnp.where(row_valid, colT, NEG)
    _, bcols = jax.lax.scan(bwd_col, colT, js, reverse=True)
    # bcols[j] = B[:, j]; we need B[:, c+1]
    B_c1 = bcols[c + 1] if c + 1 < Lr else colT

    # Diagonal-edge test at ref position c: F[qi][c] + s(q[qi], r[c]) + B[qi+1][c+1] == score
    r_c = jax.lax.dynamic_slice_in_dim(refs, c, 1, axis=1)
    s_c = _sub_scores(query, r_c)                        # (P, Lq)
    tot = F_c[:, :-1] + s_c + B_c1[:, 1:]
    on_path = (tot == score[:, None]) & (jnp.arange(Lq)[None, :] < qlen[:, None]) \
        & (c < rlen)[:, None]
    valid = jnp.any(on_path, axis=1)
    # Largest on-path index = the diagonal-preferring traceback: ties at the
    # bc/UMI boundary arise from (mismatch at last bc column) vs (ref
    # deletion + N-absorption) paths; STAR-style tracebacks keep the bc
    # fully diagonal, which is the largest qpos here.
    qpos = (Lq - 1 - jnp.argmax(on_path[:, ::-1], axis=1)).astype(jnp.int32)
    qpos = jnp.where(valid, qpos, -1)
    return score, qpos, valid


# ---------------------------------------------------------------------------
# Brute-force numpy oracle for tests.

def sw_end2end_reference(query: np.ndarray, ref: np.ndarray,
                         umi_ref_offset: int) -> tuple[int, int, bool]:
    """O(Lq*Lr) DP with the same scoring; returns (score, qpos, valid)."""
    q = [int(x) for x in query]
    r = [int(x) for x in ref]
    Lq, Lr = len(q), len(r)

    def s(qb, rb):
        if rb == N_CODE or qb == N_CODE:
            return 0
        return 1 if qb == rb else -1

    F = np.full((Lq + 1, Lr + 1), -10**9, dtype=np.int64)
    F[0, :] = 0
    for i in range(1, Lq + 1):
        F[i, 0] = -i
        for j in range(1, Lr + 1):
            F[i, j] = max(F[i-1, j-1] + s(q[i-1], r[j-1]),
                          F[i-1, j] - 1,
                          F[i, j-1] - 1)
    score = int(F[Lq, :].max())
    # backward
    B = np.full((Lq + 1, Lr + 1), -10**9, dtype=np.int64)
    B[Lq, :] = 0
    for i in range(Lq - 1, -1, -1):
        B[i, Lr] = -(Lq - i)
        for j in range(Lr - 1, -1, -1):
            B[i, j] = max(B[i+1, j+1] + s(q[i], r[j]),
                          B[i+1, j] - 1,
                          B[i, j+1] - 1)
    c = umi_ref_offset
    qpos, valid = -1, False
    if c < Lr:
        for qi in range(Lq - 1, -1, -1):   # largest on-path index, as in sw_end2end
            if F[qi, c] + s(q[qi], r[c]) + B[qi+1, c+1] == score:
                qpos, valid = qi, True
                break
    return score, qpos, valid
