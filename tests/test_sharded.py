"""Multi-device mesh equivalence: N-device sharded outputs must equal the
single-device engine exactly (the reference analogue is deterministic
shard-merge via sorted cat, SURVEY.md §4). Runs on the 8-virtual-CPU-device
mesh from conftest."""

import numpy as np
import pytest

from nanoranger_tpu import chemistry
from nanoranger_tpu.io.encode import decode, encode_batch
from nanoranger_tpu.parallel.sharded import (ShardedWhitelist,
                                             build_sharded_match, make_mesh)
from nanoranger_tpu.stages.barcode import BarcodeMatcher


def _mk_whitelist(rng, n):
    seen = set()
    while len(seen) < n:
        seen.add("".join(rng.choice(list("ACGT"), 16)))
    return np.asarray(sorted(seen))


def _mk_candidates(rng, wl, n, spec):
    seqs, qlens = [], []
    for _ in range(n):
        bc = list(wl[rng.integers(0, len(wl))])
        r = rng.random()
        if r < 0.3:
            bc[rng.integers(0, 16)] = "ACGT"[rng.integers(0, 4)]
        elif r < 0.4:
            del bc[rng.integers(0, 16)]
        umi = "".join(rng.choice(list("ACGT"), spec.umi_len))
        seqs.append("CGCTCTTCCGATCT"[-spec.bc_query_offset:]
                    + "".join(bc) + umi + "TTTCT")
    return encode_batch(seqs, max_len=96)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
def test_sharded_match_equals_single_device(rng, mesh_shape):
    spec = chemistry.get("5p10XGEX").barcode
    wl = _mk_whitelist(rng, 300)
    q, qlen = _mk_candidates(rng, wl, 64, spec)

    single = BarcodeMatcher(wl, spec)   # product screen + rc pass,
    # matching what the sharded matcher now runs per shard
    ref = single.match(q, qlen)

    n_data, n_wl = mesh_shape
    mesh = make_mesh(n_data, n_wl)
    swl = ShardedWhitelist(wl, spec, n_wl)
    arrs = swl.device_arrays(mesh)
    match_fn = build_sharded_match(swl, mesh)
    bc, score, status, umi, counts = match_fn(q, qlen, arrs)
    bc, score, status, umi = map(np.asarray, (bc, score, status, umi))

    np.testing.assert_array_equal(status, ref["status"])
    acc = status == 0
    np.testing.assert_array_equal(bc[acc], ref["bc_idx"][acc])
    np.testing.assert_array_equal(score[acc], ref["score"][acc])
    np.testing.assert_array_equal(umi[acc], ref["umi"][acc])
    # global counts = accepted reads per barcode, independent of mesh shape
    cnt = np.asarray(counts).reshape(-1)[:len(wl)]
    want = np.zeros(len(wl), np.int64)
    for b in ref["bc_idx"][acc]:
        want[b] += 1
    np.testing.assert_array_equal(cnt, want)
