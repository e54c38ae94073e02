"""Pallas TPU kernel for the windowed colinear chain DP.

Same recurrence as the scan in align/aligner._chain_dp_xla (minimap2
chain scoring, bounded G-predecessor window, segment-id gating, optional
splice gap class), but the A-step sequential loop runs inside Mosaic
kernels with the DP state resident in VMEM.
Layout: anchors transposed to (A, TB) so the sliding predecessor window
is a dynamic sublane slice; the batch rides the lane axis.

The anchor axis is processed in fixed CH-row chunks (grid dim 1,
sequential): only the last G rows of DP state cross a chunk boundary, so
they are carried in persistent VMEM scratch and rolled to the front at
each chunk start. This bounds VMEM use to O((CH+G)*TB) regardless of A —
the previous whole-A-resident layout blew the 16 MB scoped-VMEM limit at
production shapes (A≈3k, B=2048).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 64        # predecessor window (minimap2 max-chain-iter analogue)
CH = 256      # anchor rows per grid chunk
NEGF = -1e18
LOG2E = 1.4426950408889634


def _chain_kernel(t_ref, q_ref, s_ref, v_ref, f_ref, par_ref, root_ref,
                  tscr, qscr, sscr, fscr, rootscr, *, TB, k_span, max_gap,
                  bandwidth, max_intron, splice_pen):
    # scratch buffers: (CH + G, TB); rows [0, G) hold the previous chunk's
    # tail (or sentinels at the first chunk), rows [G, G+CH) the current
    # chunk. Scratch persists across grid steps; chunk dim is sequential.
    a = pl.program_id(1)

    @pl.when(a == 0)
    def _init():
        # sentinel predecessors: seg -7 never matches; f = -inf
        tscr[pl.ds(0, G), :] = jnp.full((G, TB), 2 ** 30, jnp.int32)
        qscr[pl.ds(0, G), :] = jnp.zeros((G, TB), jnp.int32)
        sscr[pl.ds(0, G), :] = jnp.full((G, TB), -7, jnp.int32)
        fscr[pl.ds(0, G), :] = jnp.full((G, TB), NEGF, jnp.float32)
        rootscr[pl.ds(0, G), :] = jnp.full((G, TB), -1, jnp.int32)

    @pl.when(a > 0)
    def _roll():
        tscr[pl.ds(0, G), :] = tscr[pl.ds(CH, G), :]
        qscr[pl.ds(0, G), :] = qscr[pl.ds(CH, G), :]
        sscr[pl.ds(0, G), :] = sscr[pl.ds(CH, G), :]
        fscr[pl.ds(0, G), :] = fscr[pl.ds(CH, G), :]
        rootscr[pl.ds(0, G), :] = rootscr[pl.ds(CH, G), :]

    tscr[pl.ds(G, CH), :] = t_ref[...]
    qscr[pl.ds(G, CH), :] = q_ref[...]
    sscr[pl.ds(G, CH), :] = s_ref[...]
    base = a * CH  # global index of this chunk's first anchor

    def body(i, _):
        # scratch row i+G is anchor base+i; rows [i, i+G) its predecessors
        ti = tscr[pl.ds(i + G, 1), :].astype(jnp.float32)     # (1, TB)
        qi = qscr[pl.ds(i + G, 1), :].astype(jnp.float32)
        si = sscr[pl.ds(i + G, 1), :]
        vi = v_ref[pl.ds(i, 1), :]
        tw = tscr[pl.ds(i, G), :].astype(jnp.float32)
        qw = qscr[pl.ds(i, G), :].astype(jnp.float32)
        sw = sscr[pl.ds(i, G), :]
        fw = fscr[pl.ds(i, G), :]
        dt = ti - tw
        dq = qi - qw
        dd = jnp.abs(dq - dt)
        dg = jnp.minimum(jnp.minimum(dq, dt), float(k_span))
        safe_dd = jnp.maximum(dd, 1.0)
        gap = 0.01 * k_span * dd + 0.5 * (jnp.log(safe_dd) * LOG2E)
        gap = jnp.where(dd > 0, gap, 0.0)
        seg_eq = (sw == si) & (fw > NEGF / 2)
        ok_n = seg_eq & (dt > 0) & (dq > 0) & (dt <= max_gap) & \
            (dq <= max_gap) & (dd <= bandwidth)
        if max_intron:
            # intron class (minimap2 -x splice): target gap beyond the band
            # (bandwidth < dt-dq <= max_intron), small query gap, flat open
            # + log2 length cost
            gap_s = 0.01 * k_span * dq + splice_pen + \
                0.5 * (jnp.log(jnp.maximum(dt - dq, 1.0)) * LOG2E)
            ok_s = seg_eq & (dq > 0) & (dq <= max_gap) & \
                (dt - dq > bandwidth) & (dt <= max_intron)
            gap = jnp.where(ok_n, gap, gap_s)
            okj = ok_n | ok_s
        else:
            okj = ok_n
        cand = jnp.where(okj, fw + dg - gap, NEGF)
        best = jnp.max(cand, axis=0, keepdims=True)           # (1, TB)
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, TB), 0)
        packed = jnp.where(cand == best, sub, -1)
        bestg = jnp.max(packed, axis=0, keepdims=True)        # last argmax
        fi = jnp.maximum(float(k_span), best)
        extend = best > float(k_span)
        par = jnp.where(extend, base + i - G + bestg, -1)
        # root propagation: the chain root rides along in scratch so no
        # host/XLA pointer-doubling pass is needed afterwards (one-hot
        # select over the predecessor window)
        rw = rootscr[pl.ds(i, G), :]
        root_from_par = jnp.max(jnp.where(sub == bestg, rw, -1), axis=0,
                                keepdims=True)
        root = jnp.where(extend, root_from_par, base + i)
        fi = jnp.where(vi, fi, NEGF)
        par = jnp.where(vi, par, -1)
        root = jnp.where(vi, root, -1)
        fscr[pl.ds(i + G, 1), :] = fi
        rootscr[pl.ds(i + G, 1), :] = root
        f_ref[pl.ds(i, 1), :] = fi
        par_ref[pl.ds(i, 1), :] = par
        root_ref[pl.ds(i, 1), :] = root
        return 0

    jax.lax.fori_loop(0, CH, body, 0)


@functools.partial(jax.jit, static_argnames=("k_span", "max_gap",
                                             "bandwidth", "max_intron",
                                             "splice_pen", "interpret"))
def chain_dp_pallas(t, q, seg, valid, k_span, max_gap, bandwidth,
                    max_intron=0, splice_pen=6.0, interpret=False):
    """t, q, seg: (B, A) int32 sorted anchors; valid: (B, A) bool.
    Returns (f (B, A) float32, parent (B, A) int32, root (B, A) int32)."""
    B0, A0 = t.shape
    TB = 128
    B = -(-B0 // TB) * TB
    A = -(-A0 // CH) * CH
    pad = ((0, B - B0), (0, A - A0))
    if pad != ((0, 0), (0, 0)):
        t = jnp.pad(t, pad, constant_values=2_000_000_000)
        q = jnp.pad(q, pad)
        seg = jnp.pad(seg, pad, constant_values=-9)
        valid = jnp.pad(valid, pad)
    tT, qT, sT, vT = t.T, q.T, seg.T, valid.T

    grid = (B // TB, A // CH)
    spec = pl.BlockSpec((CH, TB), lambda i, a: (a, i),
                        memory_space=pltpu.VMEM)
    f, par, root = pl.pallas_call(
        functools.partial(_chain_kernel, TB=TB, k_span=k_span,
                          max_gap=max_gap, bandwidth=bandwidth,
                          max_intron=max_intron, splice_pen=splice_pen),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((A, B), jnp.float32),
                   jax.ShapeDtypeStruct((A, B), jnp.int32),
                   jax.ShapeDtypeStruct((A, B), jnp.int32)],
        out_specs=[spec, spec, spec],
        scratch_shapes=[pltpu.VMEM((CH + G, TB), jnp.int32),
                        pltpu.VMEM((CH + G, TB), jnp.int32),
                        pltpu.VMEM((CH + G, TB), jnp.int32),
                        pltpu.VMEM((CH + G, TB), jnp.float32),
                        pltpu.VMEM((CH + G, TB), jnp.int32)],
        interpret=interpret,
    )(tT, qT, sT, vT)
    return f.T[:B0, :A0], par.T[:B0, :A0], root.T[:B0, :A0]
