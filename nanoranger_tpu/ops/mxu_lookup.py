"""MXU-backed table lookup: gather-as-matmul for small tables.

TPU scalar gathers run ~100M elems/s; a one-hot @ sliding-window matmul
does the same job on the MXU an order of magnitude faster (and XLA fuses
the one-hot so it is never materialized). Exactness for 32-bit payloads is
preserved by byte-plane decomposition: each int32 column is stored as four
int8 planes, one s8×s8→s32 matmul reconstructs them losslessly.

Used by the aligner's anchor lookup (hash → occurrence window) and
available for other small-table joins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_window_planes(arrays: list[np.ndarray], occ: int) -> np.ndarray:
    """Host: pack sliding windows of each int32 array into byte planes.

    arrays: list of (E,) int32; returns W (E_pad, len(arrays)*occ*4) int8
    where row e holds, for each array a and slot j, the 4 little-endian
    bytes of a[e + j] (wrapping; callers mask out-of-bucket slots)."""
    E = len(arrays[0])
    E_pad = -(-E // 128) * 128
    cols = []
    for a in arrays:
        a = np.ascontiguousarray(a.astype(np.uint32))
        a_pad = np.concatenate([a, a[: occ]]) if E else a
        win = np.stack([a_pad[j:j + E] for j in range(occ)], axis=1)  # (E, occ)
        for k in range(4):
            cols.append(((win >> (8 * k)) & 0xFF).astype(np.int8))
    W = np.concatenate(cols, axis=1)                   # (E, n*occ*4)
    if E_pad != E:
        W = np.pad(W, ((0, E_pad - E), (0, 0)))
    return W


def windowed_lookup(starts: jnp.ndarray, W: jnp.ndarray, n_arrays: int,
                    occ: int) -> list[jnp.ndarray]:
    """Device: rows W[starts]; returns per-array windows
    [(N, occ) int32 (bit-exact uint32 reinterpreted), ...].

    Uses a plain row gather: measured on v5e, XLA's row gather beats the
    one-hot int8-matmul formulation at every panel size tried (3.8 ms vs
    4.8–10.9 ms for N=512k rows, E=1.3k–8k), and the matmul cost grows
    with E while the gather does not."""
    N = starts.shape[0]
    E_pad = W.shape[0]
    raw = W[jnp.clip(starts, 0, E_pad - 1)].astype(jnp.int32)
    out = []
    for a in range(n_arrays):
        base = a * occ * 4
        val = jnp.zeros((N, occ), jnp.uint32)
        for k in range(4):
            plane = raw[:, base + k * occ: base + (k + 1) * occ].astype(jnp.uint32)
            val = val | ((plane & 0xFF) << (8 * k))
        out.append(val.astype(jnp.int32))
    return out
