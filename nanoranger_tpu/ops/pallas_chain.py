"""Pallas TPU kernel for the windowed colinear chain DP.

Same recurrence as the scan in align/aligner.seed_and_chain (minimap2
chain scoring, bounded G-predecessor window), but the whole A-step
sequential loop runs inside one Mosaic kernel with the DP state resident
in VMEM. Layout: anchors transposed to (A, TB) so the sliding predecessor
window is a dynamic sublane slice; the batch rides the lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 64
NEGF = -1e18


def _chain_kernel(t_ref, q_ref, v_ref, f_ref, par_ref, root_ref, fscr,
                  rootscr, *, A, TB, k_span, max_gap, bandwidth):
    # fscr/rootscr: (A + G, TB) scratch, rows [0, G) = padding
    fscr[...] = jnp.full((A + G, TB), NEGF, jnp.float32)
    rootscr[...] = jnp.full((A + G, TB), -1, jnp.int32)

    def body(i, _):
        # padded row i+G is original anchor i; padded rows [i, i+G) are its
        # G predecessors (original [i-G, i))
        ti = t_ref[pl.ds(i + G, 1), :].astype(jnp.float32)   # (1, TB)
        qi = q_ref[pl.ds(i + G, 1), :].astype(jnp.float32)
        vi = v_ref[pl.ds(i, 1), :]
        # predecessor window: original rows [i-G, i) = padded [i, i+G)
        tw = t_ref[pl.ds(i, G), :].astype(jnp.float32)        # rows i-G..i-1
        qw = q_ref[pl.ds(i, G), :].astype(jnp.float32)
        fw = fscr[pl.ds(i, G), :]
        # NOTE t_ref/q_ref are PADDED at the front by G rows by the caller,
        # so padded row (i+G) is original anchor i and rows [i, i+G) are its
        # G predecessors.
        dt = ti - tw
        dq = qi - qw
        dd = jnp.abs(dq - dt)
        dg = jnp.minimum(jnp.minimum(dq, dt), float(k_span))
        safe_dd = jnp.maximum(dd, 1.0)
        gap = 0.01 * k_span * dd + 0.5 * (jnp.log(safe_dd) * 1.4426950408889634)
        gap = jnp.where(dd > 0, gap, 0.0)
        cand = fw + dg - gap
        okj = (dt > 0) & (dq > 0) & (dt <= max_gap) & (dq <= max_gap) & \
            (dd <= bandwidth) & (fw > NEGF / 2)
        cand = jnp.where(okj, cand, NEGF)
        best = jnp.max(cand, axis=0, keepdims=True)           # (1, TB)
        sub = jax.lax.broadcasted_iota(jnp.int32, (G, TB), 0)
        packed = jnp.where(cand == best, sub, -1)
        bestg = jnp.max(packed, axis=0, keepdims=True)        # last argmax
        fi = jnp.maximum(float(k_span), best)
        extend = best > float(k_span)
        par = jnp.where(extend, i - G + bestg, -1)
        # root propagation: the chain root rides along in scratch so no
        # host/XLA pointer-doubling pass is needed afterwards (one-hot
        # select over the predecessor window)
        rw = rootscr[pl.ds(i, G), :]
        root_from_par = jnp.max(jnp.where(sub == bestg, rw, -1), axis=0,
                                keepdims=True)
        root = jnp.where(extend, root_from_par, i)
        fi = jnp.where(vi, fi, NEGF)
        par = jnp.where(vi, par, -1)
        root = jnp.where(vi, root, -1)
        fscr[pl.ds(i + G, 1), :] = fi
        rootscr[pl.ds(i + G, 1), :] = root
        f_ref[pl.ds(i, 1), :] = fi
        par_ref[pl.ds(i, 1), :] = par
        root_ref[pl.ds(i, 1), :] = root
        return 0

    jax.lax.fori_loop(0, A, body, 0)


@functools.partial(jax.jit, static_argnames=("k_span", "max_gap",
                                             "bandwidth", "interpret"))
def chain_dp_pallas(t, q, valid, k_span, max_gap, bandwidth,
                    interpret=False):
    """t, q: (B, A) int32 sorted anchors; valid: (B, A) bool.
    Returns (f (B, A) float32, parent (B, A) int32)."""
    B0, A = t.shape
    TB = 128
    B = -(-B0 // TB) * TB
    if B != B0:
        pad = ((0, B - B0), (0, 0))
        t = jnp.pad(t, pad, constant_values=2_000_000_000)
        q = jnp.pad(q, pad)
        valid = jnp.pad(valid, pad)
    # transpose to (A, B) and pad the anchor axis by G at the front
    tT = jnp.pad(t.T, ((G, 0), (0, 0)), constant_values=-(2 ** 30))
    qT = jnp.pad(q.T, ((G, 0), (0, 0)))
    vT = valid.T

    grid = (B // TB,)
    spec_pad = pl.BlockSpec((A + G, TB), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    spec = pl.BlockSpec((A, TB), lambda i: (0, i), memory_space=pltpu.VMEM)
    f, par, root = pl.pallas_call(
        functools.partial(_chain_kernel, A=A, TB=TB, k_span=k_span,
                          max_gap=max_gap, bandwidth=bandwidth),
        grid=grid,
        in_specs=[spec_pad, spec_pad, spec],
        out_shape=[jax.ShapeDtypeStruct((A, B), jnp.float32),
                   jax.ShapeDtypeStruct((A, B), jnp.int32),
                   jax.ShapeDtypeStruct((A, B), jnp.int32)],
        out_specs=[spec, spec, spec],
        scratch_shapes=[pltpu.VMEM((A + G, TB), jnp.float32),
                        pltpu.VMEM((A + G, TB), jnp.int32)],
        interpret=interpret,
    )(tT, qT, vT)
    return f.T[:B0], par.T[:B0], root.T[:B0]
