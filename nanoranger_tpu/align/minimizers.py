"""Minimizer sketching — one implementation shared by the reference index
build (tiny panels, run on CPU/TPU alike) and the device read sketcher.

Replaces minimap2's sketch (-x map-ont: k=15, w=10) for the seed stage of
the transcriptome aligner (reference scripts/align_trns.sh:9). We do NOT
replicate minimap2's exact invertible hash — bit-level minimizer parity is
not the contract (alignment spans are); we use a murmur3-style 32-bit
finalizer masked to 2k bits.

Scheme (matching minimap2's semantics):
- canonical k-mer: min(forward, revcomp) 2-bit packing decides the strand
  bit; palindromes (fwd == rc) and N-containing k-mers are skipped
- per window of W consecutive k-mers the RIGHTMOST minimal hash is a
  minimizer; the selected set is the union over all windows

The union rule is evaluated in closed form: position i is selected iff
some window [s, s+W-1] ∋ i has min(h[s..i-1]) >= h[i] and
min(h[i+1..s+W-1]) > h[i].  With R(i) = max run of h >= h[i] to the left
and S(i) = max run of h > h[i] to the right (both capped at W-1), that is
      W-1 - min(R(i), W-1, i)  <=  S(i)
where sequence boundaries behave as +inf (windows truncate). Everything is
incremental shifted mins — pure VPU work, no per-read control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

K = 15          # map-ont defaults (minimap2 -x map-ont)
W = 10

MASK = (1 << 30) - 1  # 2k = 30 bits
# numpy (not jnp) so importing this module never initializes a JAX backend
HINF = np.uint32(0xFFFFFFFF)


def _mix32(h: jnp.ndarray) -> jnp.ndarray:
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h & jnp.uint32(MASK)


def _shift_left_fill(x, s, fill):
    """x shifted so that out[i] = x[i-s] (s>0), boundary = fill."""
    B = x.shape[0]
    return jnp.concatenate([jnp.full((B, s), fill, x.dtype), x[:, :-s]], axis=1)


def _shift_right_fill(x, s, fill):
    """out[i] = x[i+s]."""
    B = x.shape[0]
    return jnp.concatenate([x[:, s:], jnp.full((B, s), fill, x.dtype)], axis=1)


@functools.partial(jax.jit, static_argnames=("max_minimizers",))
def sketch_batch(codes: jnp.ndarray, lengths: jnp.ndarray, max_minimizers: int):
    """Minimizers of each row of a (B, L) int8 code batch.

    Returns (hashes (B, M) uint32, pos (B, M) int32, strand (B, M) int32,
    count (B,) int32); slots beyond count have pos = -1, hash = 0xFFFFFFFF.
    """
    B, L = codes.shape
    n = L - K + 1
    c = codes.astype(jnp.uint32)
    fwd = jnp.zeros((B, n), jnp.uint32)
    rev = jnp.zeros((B, n), jnp.uint32)
    valid = jnp.ones((B, n), bool)
    for t in range(K):
        ct = jax.lax.dynamic_slice_in_dim(c, t, n, axis=1)
        valid = valid & (ct < 4)
        fwd = ((fwd << 2) | (ct & 3)) & jnp.uint32(MASK)
        # complement of base b∈{0..3} is 3-b — arithmetic, not a table
        # gather (gathers are the slow op on TPU; invalid lanes are
        # masked by `valid`, so (3-ct)&3 garbage there is harmless)
        rev = rev | (((jnp.uint32(3) - ct) & 3) << (2 * t))
    strand = (rev < fwd).astype(jnp.int32)
    canon = jnp.where(strand == 1, rev, fwd)
    valid = valid & (fwd != rev)
    valid = valid & (jnp.arange(n)[None, :] <= (lengths[:, None] - K))
    h = jnp.where(valid, _mix32(canon), HINF)

    # left runs: R(i) = #consecutive d=1..W-1 with min(h[i-d..i-1]) >= h[i]
    # right runs: S(i) = #consecutive d with min(h[i+1..i+d]) > h[i]
    R = jnp.zeros((B, n), jnp.int32)
    S = jnp.zeros((B, n), jnp.int32)
    lmin = jnp.full((B, n), HINF)
    rmin = jnp.full((B, n), HINF)
    r_ok = jnp.ones((B, n), bool)
    s_ok = jnp.ones((B, n), bool)
    for d in range(1, W):
        lmin = jnp.minimum(lmin, _shift_left_fill(h, d, HINF))
        rmin = jnp.minimum(rmin, _shift_right_fill(h, d, HINF))
        r_ok = r_ok & (lmin >= h)
        s_ok = s_ok & (rmin > h)
        R = R + r_ok.astype(jnp.int32)
        S = S + s_ok.astype(jnp.int32)

    i_idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    d_cap = jnp.minimum(jnp.minimum(R, W - 1), i_idx)
    sel = ((W - 1) - d_cap) <= S
    sel = sel & valid & (h != HINF)

    # compact selected positions, ascending, into (B, M)
    pos_all = jnp.broadcast_to(i_idx, (B, n))
    sort_key = jnp.where(sel, pos_all, n + pos_all)
    M = min(max_minimizers, n)
    # one sort (selected-first, by position) — applying an argsort
    # permutation with take_along_axis would be a slow TPU gather. The
    # key already encodes pos and sel; strand packs into its low bit
    # (keys are distinct, so the extra bit never flips an ordering),
    # leaving the hash as the single payload.
    packed, hashes = jax.lax.sort(
        ((sort_key << 1) | strand, h), dimension=1, num_keys=1,
        is_stable=False)
    packed = packed[:, :M]
    key = packed >> 1
    strands = packed & 1
    pos = jnp.where(key < n, key, key - n)
    hashes = hashes[:, :M]
    count = jnp.minimum(jnp.sum(sel, axis=1), M).astype(jnp.int32)
    slot = jnp.arange(M, dtype=jnp.int32)[None, :]
    ok = slot < count[:, None]
    pos = jnp.where(ok, pos, -1)
    hashes = jnp.where(ok, hashes, HINF)
    strands = jnp.where(ok, strands, 0)
    if M < max_minimizers:  # keep the promised fixed output shape
        padn = max_minimizers - M
        pos = jnp.pad(pos, ((0, 0), (0, padn)), constant_values=-1)
        hashes = jnp.pad(hashes, ((0, 0), (0, padn)),
                         constant_values=np.uint32(0xFFFFFFFF))
        strands = jnp.pad(strands, ((0, 0), (0, padn)))
    return hashes, pos.astype(jnp.int32), strands, count


def sketch_seq(codes: np.ndarray, max_minimizers: int | None = None):
    """Host convenience: minimizers of a single sequence (for index build)."""
    L = len(codes)
    m = max_minimizers or max(16, L)
    h, p, s, cnt = sketch_batch(np.asarray(codes, np.int8)[None, :],
                                np.asarray([L], np.int32), m)
    c = int(cnt[0])
    return (np.asarray(h[0, :c]), np.asarray(p[0, :c]), np.asarray(s[0, :c]))
