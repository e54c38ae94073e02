"""Pallas TPU kernel for the bounded edit-distance infix search.

Same semantics as ops/edit_distance.hw_locate (edlib-HW parity, see that
module), but the whole m-row DP runs inside one Mosaic kernel: the row
state lives in VMEM scratch, each row is a handful of VPU ops plus a
log-shift prefix-min on the lane axis (pltpu.roll), and only the final
(dist, end) / start reductions leave the chip. This removes the
scan-of-cummin lowering that costs minutes of XLA compile time and ~10×
runtime at the jnp level.

Two kernels:
  _fwd_kernel: HW pass → (dist, end_first, end_last) per row
  _rev_kernel: anchored SHW pass over pre-reversed windows → smallest
               optimal start for the chosen end
The window reversal between passes is a plain XLA gather (cheap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..io.encode import N as N_CODE
from ..io.encode import PAD as PAD_CODE

BIG = 1 << 20


def _match(p_char, t_chars, wildcard: bool):
    eq = t_chars == p_char
    if wildcard:
        eq = eq | (p_char == N_CODE) | (t_chars == N_CODE)
    return eq & (t_chars != PAD_CODE)


def _prefix_min_lanes(x, W):
    """Inclusive prefix-min along lanes via log-shift rolls."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < W:
        shifted = pltpu.roll(x, s, axis=1)
        shifted = jnp.where(lane >= s, shifted, BIG)
        x = jnp.minimum(x, shifted)
        s *= 2
    return x


def _row_update(prev, c, i, W):
    """One DP row: t = min(diag + c, up + 1) folded with D[i][0]=i, then
    prefix-min for the horizontal moves. Lanes hold j = 1..W."""
    lane = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 1)
    diag = pltpu.roll(prev, 1, axis=1)
    diag = jnp.where(lane == 0, i - 1, diag)       # D[i-1][0] = i-1
    t = jnp.minimum(diag + c, prev + 1)
    t = jnp.where(lane == 0, jnp.minimum(t, i + 1), t)  # via D[i][0] = i
    return _prefix_min_lanes(t - lane, W) + lane


def _fwd_kernel(pat_ref, texts_ref, len_ref, dist_ref, ef_ref, el_ref, *,
                m, W, wildcard, k):
    texts = texts_ref[...].astype(jnp.int32)
    TB = texts.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)

    def body(i, row):
        p = pat_ref[0, i - 1]
        c = jnp.where(_match(p, texts, wildcard), 0, 1)
        return _row_update(row, c, i, W)

    row0 = jnp.zeros((TB, W), jnp.int32)           # D[0][j] = 0 (HW)
    final = jax.lax.fori_loop(1, m + 1, body, row0)

    ln = len_ref[...].astype(jnp.int32)            # (TB, 1)
    valid = lane < ln
    scores = jnp.where(valid, final, BIG)
    dist = jnp.min(scores, axis=1, keepdims=True)
    # ends: pack (value, lane) so one min gives first/last argmin
    pack_f = scores * (2 * W) + lane
    pack_l = scores * (2 * W) + (W - 1 - lane)
    ef = jnp.min(pack_f, axis=1, keepdims=True) % (2 * W)
    el = (W - 1) - jnp.min(pack_l, axis=1, keepdims=True) % (2 * W)
    hit = dist <= k
    dist_ref[...] = jnp.where(hit, dist, -1)
    ef_ref[...] = jnp.where(hit, ef, -1)           # inclusive end == lane
    el_ref[...] = jnp.where(hit, el, -1)


def _rev_kernel(pat_ref, rtexts_ref, e_ref, dist_ref, start_ref, *,
                m, W, wildcard):
    rtexts = rtexts_ref[...].astype(jnp.int32)
    TB = rtexts.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, W), 1)

    def body(i, row):
        p = pat_ref[0, m - i]                      # reversed pattern
        c = jnp.where(_match(p, rtexts, wildcard), 0, 1)
        return _row_update(row, c, i, W)

    row0 = lane + 1                                # D[0][j] = j (SHW)
    final = jax.lax.fori_loop(1, m + 1, body, row0)

    e = e_ref[...].astype(jnp.int32)               # (TB, 1) inclusive end
    d = dist_ref[...].astype(jnp.int32)
    ok = (lane <= e) & (final == d)
    x_max = jnp.max(jnp.where(ok, lane, -1), axis=1, keepdims=True)
    start_ref[...] = jnp.where(d >= 0, e - x_max, -1)


TILE_B = 256  # rows per grid program: keeps VMEM well under the 16MB budget


@functools.partial(jax.jit,
                   static_argnames=("k", "wildcard", "pick_last", "m",
                                    "interpret"))
def _hw_locate_pallas(pattern, texts, lengths, k, wildcard, pick_last, m,
                      interpret):
    B0, W = texts.shape
    B = -(-B0 // TILE_B) * TILE_B
    if B != B0:
        texts = jnp.pad(texts, ((0, B - B0), (0, 0)),
                        constant_values=PAD_CODE)
        lengths = jnp.pad(lengths, (0, B - B0))
    pat = jnp.zeros((1, 64), jnp.int32).at[0, :m].set(pattern.astype(jnp.int32))
    ln = lengths.astype(jnp.int32).reshape(B, 1)
    grid = (B // TILE_B,)
    pat_spec = pl.BlockSpec((1, 64), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    row_spec = lambda w: pl.BlockSpec((TILE_B, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)

    dist, ef, el = pl.pallas_call(
        functools.partial(_fwd_kernel, m=m, W=W, wildcard=wildcard, k=int(k)),
        grid=grid,
        out_shape=[jax.ShapeDtypeStruct((B, 1), jnp.int32)] * 3,
        in_specs=[pat_spec, row_spec(W), row_spec(1)],
        out_specs=[row_spec(1)] * 3,
        interpret=interpret,
    )(pat, texts, ln)

    end = el if pick_last else ef
    # reversed windows Tr[x] = T[end - x] (XLA gather between kernels)
    x = jnp.arange(W, dtype=jnp.int32)[None, :]
    gidx = jnp.clip(end - x, 0, W - 1)
    rtexts = jnp.take_along_axis(texts.astype(jnp.int32), gidx, axis=1)
    rtexts = jnp.where(x <= end, rtexts, PAD_CODE).astype(jnp.int8)

    start = pl.pallas_call(
        functools.partial(_rev_kernel, m=m, W=W, wildcard=wildcard),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, 1), jnp.int32),
        in_specs=[pat_spec, row_spec(W), row_spec(1), row_spec(1)],
        out_specs=row_spec(1),
        interpret=interpret,
    )(pat, rtexts, end, dist)

    return dist[:B0, 0], start[:B0, 0], end[:B0, 0]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def hw_locate_pallas(pattern, texts, lengths, k, wildcard=False,
                     pick_last=False, interpret=None):
    """Drop-in for ops.edit_distance.hw_locate (interprets on CPU)."""
    m = int(pattern.shape[0])  # shape only: pattern may be a traced constant
    if interpret is None:
        interpret = not _on_tpu()
    return _hw_locate_pallas(jnp.asarray(pattern), jnp.asarray(texts),
                             jnp.asarray(lengths), int(k), bool(wildcard),
                             bool(pick_last), m, bool(interpret))
