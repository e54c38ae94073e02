"""Bounded edit-distance infix search — the adapter-motif scanner.

Replaces every `edlib.align(pattern, window, 'HW', 'locations', k[, ad_seq])`
call in the reference (utils.py:134,271,345,437,1051,1367) with a batched
device computation over fixed-shape windows.

Semantics replicated exactly (validated against a pure-python DP port in
tests/test_edit_distance.py):

- 'HW' (infix) mode: pattern fully consumed, text flanks free.
- k cutoff: distance > k reports no hit (edlib returns -1).
- N wildcards: with `wildcard=True` the edlib `additionalEqualities`
  pairs [('N','A'),('N','T'),('N','G'),('N','C')] (utils.py:15) make N in
  *either* sequence match any base.
- locations: edlib lists optimal (start, end) pairs by ascending *inclusive*
  end; the reference uses locations[-1] (5' modes) or locations[0] (3').
  For a given end, edlib's start is the SMALLEST optimal start (it aligns
  the reversed pattern in SHW mode and keeps the last position — edlib.cpp
  "Taking last location as start ensures ... consistent with traceback").

TPU-first formulation: the row recurrence
    D[i][j] = min(D[i-1][j-1] + c, D[i-1][j] + 1, D[i][j-1] + 1)
has a horizontal dependence, but because horizontal moves cost exactly 1 it
collapses to a prefix-min:  row = cummin(t - iota) + iota  where
t[j] = min(prev[j-1]+c, prev[j]+1).  Each pattern row is then pure
elementwise VPU work + one cumulative min along the lane axis, batched over
all (read, window) rows at once — no per-read control flow, fully jittable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io.encode import N as N_CODE
from ..io.encode import PAD as PAD_CODE

BIG = np.int32(1 << 20)  # np not jnp: avoid backend init at import


def _match_mask(p_char, t_chars, wildcard: bool):
    """True where pattern char aligns with text char at cost 0."""
    eq = t_chars == p_char
    if wildcard:
        eq = eq | (p_char == N_CODE) | (t_chars == N_CODE)
    # PAD never matches anything (even pattern N)
    return eq & (t_chars != PAD_CODE)


def _prefix_min(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix-min along the last axis via log-shift (static graph;
    compiles and runs far better on TPU than lax.cummin's lowering)."""
    B, n = x.shape
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.full((B, s), BIG, x.dtype), x[:, :-s]], axis=1)
        x = jnp.minimum(x, shifted)
        s *= 2
    return x


def _rows_scan(pattern: jnp.ndarray, texts: jnp.ndarray, init_row: jnp.ndarray,
               wildcard: bool) -> jnp.ndarray:
    """Run the m-row DP; returns final row (B, W+1).

    init_row encodes the mode: HW uses D[0][j]=0; SHW uses D[0][j]=j.
    D[i][0] is i in both modes (pattern-prefix deletions).
    """
    B, W = texts.shape
    iota = jnp.arange(W + 1, dtype=jnp.int32)[None, :]

    def step(prev, args):
        i, p_char = args
        c = jnp.where(_match_mask(p_char, texts, wildcard), 0, 1).astype(jnp.int32)
        diag = prev[:, :-1] + c          # D[i-1][j-1] + c  (j=1..W)
        up = prev[:, 1:] + 1             # D[i-1][j] + 1
        t = jnp.minimum(diag, up)
        t = jnp.concatenate([i[None].repeat(B)[:, None], t], axis=1)  # D[i][0]=i
        row = _prefix_min(t - iota) + iota
        return row, None

    m = pattern.shape[0]
    idx = jnp.arange(1, m + 1, dtype=jnp.int32)
    final, _ = jax.lax.scan(step, init_row, (idx, pattern))
    return final


def hw_locate(pattern, texts, lengths, k, wildcard: bool = False,
              pick_last: bool = False):
    """Dispatch: Pallas kernel on TPU (ops/pallas_ed.py — ~20× faster and
    ~150× faster to compile), reference XLA implementation on CPU."""
    import jax as _jax
    if _jax.default_backend() != "cpu":
        from .pallas_ed import hw_locate_pallas
        return hw_locate_pallas(pattern, texts, lengths, k,
                                wildcard=wildcard, pick_last=pick_last,
                                interpret=False)
    return hw_locate_xla(pattern, texts, lengths, k,
                         wildcard=wildcard, pick_last=pick_last)


@functools.partial(jax.jit, static_argnames=("wildcard", "pick_last"))
def hw_locate_xla(pattern: jnp.ndarray, texts: jnp.ndarray, lengths: jnp.ndarray,
                  k: int, wildcard: bool = False, pick_last: bool = False):
    """Batched edlib-HW 'locations' search.

    Args:
      pattern: (m,) int8/int32 codes.
      texts:   (B, W) int8 codes, PAD beyond each row's length.
      lengths: (B,) int32 valid lengths.
      k:       edlib cutoff (scalar, may be traced).
      wildcard: N-equivalence pairs active.
      pick_last: choose locations[-1] (True) vs locations[0] (False).

    Returns (dist, start, end) int32 arrays of shape (B,):
      dist = -1 where best distance > k (no hit); start/end are the edlib
      location pair (end INCLUSIVE) for the chosen end, undefined where
      dist == -1.
    """
    pattern = pattern.astype(jnp.int32)
    texts = texts.astype(jnp.int32)
    B, W = texts.shape
    iota = jnp.arange(W + 1, dtype=jnp.int32)[None, :]

    # ---- forward HW pass: best distance + optimal ends --------------------
    init = jnp.zeros((B, W + 1), jnp.int32)
    final = _rows_scan(pattern, texts, init, wildcard)
    # end j (DP column) corresponds to inclusive text end j-1; j=0 (empty
    # match) is unreachable for our patterns (m > k always) — mask it.
    valid = (iota >= 1) & (iota <= lengths[:, None])
    scores = jnp.where(valid, final, BIG)
    dist = jnp.min(scores, axis=1)
    is_opt = scores == dist[:, None]
    end_first = jnp.argmax(is_opt, axis=1) - 1
    end_last = (W - jnp.argmax(is_opt[:, ::-1], axis=1)) - 1
    end = jnp.where(pick_last, end_last, end_first) if isinstance(pick_last, jnp.ndarray) \
        else (end_last if pick_last else end_first)

    # ---- anchored reverse SHW pass: smallest optimal start for `end` ------
    # reversed window Tr[x] = T[end - x], x = 0..end; PAD beyond.
    x = jnp.arange(W, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(end[:, None] - x, 0, W - 1)
    rtexts = jnp.take_along_axis(texts, gather_idx, axis=1)
    rtexts = jnp.where(x <= end[:, None], rtexts, PAD_CODE)
    init_shw = jnp.broadcast_to(iota, (B, W + 1)).astype(jnp.int32)  # D[0][j]=j
    rfinal = _rows_scan(pattern[::-1], rtexts, init_shw, wildcard)
    rvalid = (iota >= 1) & (iota <= end[:, None] + 1)
    rscores = jnp.where(rvalid, rfinal, BIG)
    # optimal positions x = j-1 with score == dist; edlib keeps the largest x
    ropt = rscores == dist[:, None]
    x_max = (W - jnp.argmax(ropt[:, ::-1], axis=1)) - 1
    start = end - x_max

    hit = dist <= jnp.int32(k)
    dist = jnp.where(hit, dist, -1)
    return dist, jnp.where(hit, start, -1), jnp.where(hit, end, -1)


# ---------------------------------------------------------------------------
# Pure-python/numpy reference replicating edlib for parity tests.

def edlib_hw_reference(pattern: np.ndarray, text: np.ndarray, k: int,
                       wildcard: bool = False) -> dict:
    """O(m*n) DP port of edlib.align(mode='HW', task='locations', k=k).

    Returns {'editDistance': d or -1, 'locations': [(start, end_incl), ...]}
    with ends ascending and, per end, the smallest optimal start.
    """
    m, n = len(pattern), len(text)

    def match(pc, tc):
        if tc == PAD_CODE:
            return False
        if pc == tc:
            return True
        if wildcard and (pc == N_CODE or tc == N_CODE):
            return True
        return False

    prev = np.zeros(n + 1, dtype=np.int64)
    for i in range(1, m + 1):
        row = np.empty(n + 1, dtype=np.int64)
        row[0] = i
        for j in range(1, n + 1):
            c = 0 if match(pattern[i - 1], text[j - 1]) else 1
            row[j] = min(prev[j - 1] + c, prev[j] + 1, row[j - 1] + 1)
        prev = row
    best = prev[1:].min() if n else m
    if best > k:
        return {"editDistance": -1, "locations": []}
    locations = []
    for j in range(1, n + 1):
        if prev[j] != best:
            continue
        e = j - 1
        # reverse SHW on T[0..e] to find smallest optimal start
        rp = pattern[::-1]
        rt = text[e::-1]
        rprev = np.arange(len(rt) + 1, dtype=np.int64)  # D[0][j] = j
        for i in range(1, m + 1):
            rrow = np.empty(len(rt) + 1, dtype=np.int64)
            rrow[0] = i
            for jj in range(1, len(rt) + 1):
                c = 0 if match(rp[i - 1], rt[jj - 1]) else 1
                rrow[jj] = min(rprev[jj - 1] + c, rprev[jj] + 1, rrow[jj - 1] + 1)
            rprev = rrow
        xs = [jj - 1 for jj in range(1, len(rt) + 1) if rprev[jj] == best]
        x_max = max(xs)
        locations.append((e - x_max, e))
    return {"editDistance": int(best), "locations": locations}
