"""Pallas TPU kernel for the end-to-end whitelist rescorer.

Same semantics as ops/sw.sw_end2end (STAR-equivalent scoring + UMI query
position via forward/backward snapshot columns — see that module), fused
into one Mosaic kernel: both Lr-column passes run inside the kernel with
the DP state on the lane axis, ref characters extracted by one-hot lane
reduction, and the query-insertion recurrence collapsed to a log-shift
prefix-max. Replaces two XLA scans whose lowering dominates compile time.
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

NEG = -(1 << 20)


def _prefix_max_lanes(x, n):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        shifted = pltpu.roll(x, s, axis=1)
        shifted = jnp.where(lane >= s, shifted, NEG)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _roll_left(x, s):
    # pltpu.roll only accepts non-negative shifts; left-shift by s is a
    # circular right-shift by (width - s)
    return pltpu.roll(x, x.shape[1] - s, axis=1)


def _suffix_max_lanes(x, n):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        shifted = _roll_left(x, s)
        shifted = jnp.where(lane < x.shape[1] - s, shifted, NEG)
        x = jnp.maximum(x, shifted)
        s *= 2
    return x


def _sw_kernel(q_ref, refs_ref, qlen_ref, score_ref, qpos_ref, valid_ref,
               *, Lq, Lr, Wl, c):
    """Wl = padded lane width (>= Lq+2). Lanes hold DP row index i=0..Lq."""
    TB = q_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, Wl), 1)
    qlen = qlen_ref[...].astype(jnp.int32)                 # (TB, 1)
    refs = refs_ref[...].astype(jnp.int32)                 # (TB, Lr)
    rlane = jax.lax.broadcasted_iota(jnp.int32, (TB, Lr), 1)

    # qsh: lane i (>=1) holds q[i-1]; lane 0 = PAD
    q = q_ref[...].astype(jnp.int32)                       # (TB, Lq)
    qsh = jnp.full((TB, Wl), PAD_CODE, jnp.int32)
    qsh = jnp.where((lane >= 1) & (lane <= Lq),
                    pltpu.roll(jnp.pad(q, ((0, 0), (0, Wl - Lq)),
                                       constant_values=PAD_CODE), 1, axis=1),
                    PAD_CODE)

    def sub(rj):
        neutral = (rj == N_CODE) | (qsh == N_CODE)
        s = jnp.where(qsh == rj, 1, -1)
        s = jnp.where(neutral, 0, s)
        return jnp.where((qsh == PAD_CODE) | (rj == PAD_CODE), -1, s)

    def ref_char(j):
        return jnp.sum(jnp.where(rlane == j, refs, 0), axis=1,
                       keepdims=True)                      # (TB, 1)

    row_ok = lane <= qlen

    # ---- forward ----
    col0 = jnp.where(row_ok, -lane, NEG)

    def fwd(j, carry):
        col, best, fc = carry
        rj = ref_char(j)
        s = sub(rj)
        diag = pltpu.roll(col, 1, axis=1) + s
        diag = jnp.where(lane == 0, NEG, diag)
        t = jnp.maximum(diag, col - 1)
        t = jnp.where(lane == 0, 0, t)                     # row 0 free
        newcol = _prefix_max_lanes(t + lane, Wl) - lane
        newcol = jnp.where(row_ok, newcol, NEG)
        fc = jnp.where(j == c, col, fc)                    # F[:, c] snapshot
        endv = jnp.max(jnp.where(lane == qlen, newcol, NEG), axis=1,
                       keepdims=True)
        return newcol, jnp.maximum(best, endv), fc

    end0 = jnp.max(jnp.where(lane == qlen, col0, NEG), axis=1, keepdims=True)
    _, best, fc = jax.lax.fori_loop(
        0, Lr, fwd, (col0, end0, jnp.zeros((TB, Wl), jnp.int32)))
    score_ref[...] = best

    # ---- backward ----
    colT = jnp.where(row_ok, -(qlen - lane), NEG)

    def bwd(j, carry):
        col, bc = carry                                    # col = B[:, j+1]
        bc = jnp.where(j == c, col, bc)                    # B[:, c+1] snapshot
        rj = ref_char(j)
        s = sub(rj)
        # diag: B[i][j] gets B[i+1][j+1] + s(q[i], r[j]); lane i uses q[i]
        # = qsh at lane i+1 → roll s left by 1
        s_i = _roll_left(s, 1)
        diag = _roll_left(col, 1) + s_i
        diag = jnp.where(lane >= qlen, NEG, diag)
        t = jnp.maximum(diag, col - 1)
        t = jnp.where(lane == qlen, 0, t)                  # free ref suffix
        t = jnp.where(lane > qlen, NEG, t)
        newcol = _suffix_max_lanes(t - lane, Wl) + lane
        newcol = jnp.where(row_ok, newcol, NEG)
        return newcol, bc

    _, bc1 = jax.lax.fori_loop(
        0, Lr, lambda jj, cc: bwd(Lr - 1 - jj, cc),
        (colT, jnp.zeros((TB, Wl), jnp.int32)))

    # ---- diagonal-edge test at ref column c ----
    rc = ref_char(c)
    s_c = sub(rc)                                          # lane i: q[i-1] vs r[c]
    # pair (qi, c): F[qi][c] + s(q[qi], r[c]) + B[qi+1][c+1] == score
    # lane alignment: use lane = qi+1 ⇒ F at lane qi (roll fc left? )
    f_qi = pltpu.roll(fc, 1, axis=1)                       # lane qi+1 ← fc[qi]... see below
    # fc lanes hold F[i][c] at lane i. For pair index qi = lane-1:
    #   F[qi][c]   = fc at lane-1  = roll(fc, 1)
    #   s(q[qi],.) = s_c at lane (qsh lane i = q[i-1])
    #   B[qi+1]    = bc1 at lane
    tot = f_qi + s_c + bc1
    ok = (lane >= 1) & (lane <= qlen) & (tot == best)
    qpos_max = jnp.max(jnp.where(ok, lane - 1, -1), axis=1, keepdims=True)
    valid_ref[...] = (qpos_max >= 0).astype(jnp.int32)
    qpos_ref[...] = qpos_max


def _sw_banded_kernel(q_ref, band_ref, qlen_ref, score_ref, qpos_ref,
                      valid_ref, *, Lq, Lr, Wl, c_lo, c):
    """Banded variant exploiting the whitelist-ref structure
    N*pad_left + core + N*pad_right (io/whitelist.padded_refs): N columns
    are score-neutral, so the DP outside the core has closed forms —
    entry column F[i][c_lo] = -max(0, i - c_lo), completion from (i, c)
    = -max(0, (qlen-i) - (Lr-c)) — and the whole backward pass reduces to
    B[i][c+1] = -max(0, (qlen-i) - (Lr-c-1)). Identical results to
    _sw_kernel at ~core/Lr of the sequential work (17/86 for 10x), with
    no backward scan. band_ref holds ref columns [c_lo, c] (core + the
    first right-pad N at local column c-c_lo)."""
    TB = q_ref.shape[0]
    CB = c - c_lo
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, Wl), 1)
    qlen = qlen_ref[...].astype(jnp.int32)                 # (TB, 1)
    band = band_ref[...].astype(jnp.int32)                 # (TB, CB+1)
    rlane = jax.lax.broadcasted_iota(jnp.int32, (TB, CB + 1), 1)

    q = q_ref[...].astype(jnp.int32)
    qsh = jnp.full((TB, Wl), PAD_CODE, jnp.int32)
    qsh = jnp.where((lane >= 1) & (lane <= Lq),
                    pltpu.roll(jnp.pad(q, ((0, 0), (0, Wl - Lq)),
                                       constant_values=PAD_CODE), 1, axis=1),
                    PAD_CODE)

    def sub(rj):
        neutral = (rj == N_CODE) | (qsh == N_CODE)
        s = jnp.where(qsh == rj, 1, -1)
        s = jnp.where(neutral, 0, s)
        return jnp.where((qsh == PAD_CODE) | (rj == PAD_CODE), -1, s)

    def band_char(jp):
        return jnp.sum(jnp.where(rlane == jp, band, 0), axis=1,
                       keepdims=True)                      # (TB, 1)

    row_ok = lane <= qlen

    # entry column F[:, c_lo] (free row-0 restart + neutral N prefix)
    col0 = jnp.where(row_ok, -jnp.maximum(lane - c_lo, 0), NEG)

    def fwd(jp, carry):
        col, best = carry
        s = sub(band_char(jp))
        diag = pltpu.roll(col, 1, axis=1) + s
        diag = jnp.where(lane == 0, NEG, diag)
        t = jnp.maximum(diag, col - 1)
        t = jnp.where(lane == 0, 0, t)                     # row 0 free
        newcol = _prefix_max_lanes(t + lane, Wl) - lane
        newcol = jnp.where(row_ok, newcol, NEG)
        endv = jnp.max(jnp.where(lane == qlen, newcol, NEG), axis=1,
                       keepdims=True)
        return newcol, jnp.maximum(best, endv)

    end0 = jnp.max(jnp.where(lane == qlen, col0, NEG), axis=1, keepdims=True)
    fc, best = jax.lax.fori_loop(0, CB, fwd, (col0, end0))  # fc = F[:, c]

    # closed-form completion through the all-N suffix
    comp = -jnp.maximum((qlen - lane) - (Lr - c), 0)
    full = jnp.max(jnp.where(row_ok, fc + comp, NEG), axis=1, keepdims=True)
    best = jnp.maximum(best, full)
    score_ref[...] = best

    # closed-form B[:, c+1]
    bc1 = jnp.where(row_ok, -jnp.maximum((qlen - lane) - (Lr - c - 1), 0),
                    NEG)

    # diagonal-edge test at ref column c (an N column: s = 0 / PAD -1)
    s_c = sub(band_char(CB))
    f_qi = pltpu.roll(fc, 1, axis=1)
    tot = f_qi + s_c + bc1
    ok = (lane >= 1) & (lane <= qlen) & (tot == best)
    qpos_max = jnp.max(jnp.where(ok, lane - 1, -1), axis=1, keepdims=True)
    valid_ref[...] = (qpos_max >= 0).astype(jnp.int32)
    qpos_ref[...] = qpos_max


@functools.partial(jax.jit, static_argnames=("c_lo", "c", "Lr", "interpret"))
def _sw_banded_pallas(q, qlen, band, c_lo, c, Lr, interpret):
    P0, Lq = q.shape
    TB = 256
    P = -(-P0 // TB) * TB
    if P != P0:
        q = jnp.pad(q, ((0, P - P0), (0, 0)), constant_values=PAD_CODE)
        qlen = jnp.pad(qlen, (0, P - P0))
        band = jnp.pad(band, ((0, P - P0), (0, 0)), constant_values=PAD_CODE)
    Wl = -(-(Lq + 2) // 128) * 128
    grid = (P // TB,)
    vs = lambda w: pl.BlockSpec((TB, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    score, qpos, valid = pl.pallas_call(
        functools.partial(_sw_banded_kernel, Lq=Lq, Lr=Lr, Wl=Wl,
                          c_lo=c_lo, c=c),
        grid=grid,
        in_specs=[vs(Lq), vs(c - c_lo + 1), vs(1)],
        out_shape=[jax.ShapeDtypeStruct((P, 1), jnp.int32)] * 3,
        out_specs=[vs(1)] * 3,
        interpret=interpret,
    )(q.astype(jnp.int32), band.astype(jnp.int32),
      qlen.astype(jnp.int32).reshape(P, 1))
    return (score[:P0, 0], qpos[:P0, 0], valid[:P0, 0].astype(bool))


def sw_end2end_banded_pallas(query, qlen, refs, Lr, umi_ref_offset,
                             pad_left, interpret=None):
    """Banded drop-in for sw_end2end on padded-whitelist refs: refs must be
    N*pad_left + core + N*(Lr - umi_ref_offset) rows (uniform width Lr).
    refs may be pre-sliced to the band [pad_left, umi_ref_offset]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    refs = jnp.asarray(refs)
    w = umi_ref_offset - pad_left + 1
    band = refs if refs.shape[1] == w else \
        jax.lax.slice_in_dim(refs, pad_left, umi_ref_offset + 1, axis=1)
    score, qpos, valid = _sw_banded_pallas(
        jnp.asarray(query), jnp.asarray(qlen), band, int(pad_left),
        int(umi_ref_offset), int(Lr), bool(interpret))
    qpos = jnp.where(valid, qpos, -1)
    return score, qpos, valid


@functools.partial(jax.jit, static_argnames=("c", "Lr", "interpret"))
def _sw_pallas(q, qlen, refs, c, Lr, interpret):
    P0, Lq = q.shape
    TB = 256
    P = -(-P0 // TB) * TB
    if P != P0:
        q = jnp.pad(q, ((0, P - P0), (0, 0)), constant_values=PAD_CODE)
        qlen = jnp.pad(qlen, (0, P - P0))
        refs = jnp.pad(refs, ((0, P - P0), (0, 0)), constant_values=PAD_CODE)
    Wl = -(-(Lq + 2) // 128) * 128
    grid = (P // TB,)
    vs = lambda w: pl.BlockSpec((TB, w), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    score, qpos, valid = pl.pallas_call(
        functools.partial(_sw_kernel, Lq=Lq, Lr=Lr, Wl=Wl, c=c),
        grid=grid,
        in_specs=[vs(Lq), vs(Lr), vs(1)],
        out_shape=[jax.ShapeDtypeStruct((P, 1), jnp.int32)] * 3,
        out_specs=[vs(1)] * 3,
        interpret=interpret,
    )(q.astype(jnp.int32), refs.astype(jnp.int32),
      qlen.astype(jnp.int32).reshape(P, 1))
    return (score[:P0, 0], qpos[:P0, 0], valid[:P0, 0].astype(bool))


def sw_end2end_pallas(query, qlen, refs, rlen, umi_ref_offset,
                      interpret=None):
    """Drop-in for ops.sw.sw_end2end (rlen must be uniform = refs width)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Lr = int(refs.shape[1])
    score, qpos, valid = _sw_pallas(jnp.asarray(query), jnp.asarray(qlen),
                                    jnp.asarray(refs), int(umi_ref_offset),
                                    Lr, bool(interpret))
    qpos = jnp.where(valid, qpos, -1)
    return score, qpos, valid
