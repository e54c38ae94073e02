"""Multi-chip scale-out: data-parallel reads × model-parallel whitelist.

Replaces the reference's distributed story (seqkit split + multiprocessing
Pool + cat/JSON merges, SURVEY.md §2.3) with a jax.sharding Mesh:

  axis 'data' — read batches are sharded (the reference's shard
                data-parallelism); per-barcode count tensors merge with a
                psum over this axis (the reference's JSON dict-sum,
                utils.py:1419-1431)
  axis 'wl'   — the whitelist (737K/3M barcodes) is partitioned across
                chips; each shard screens + exact-rescored its local
                barcodes and the per-read (best, runner-up) summaries
                all-gather over 'wl' for the global unique-best decision
                (the argmax all-reduce of SURVEY.md §2.3)

Two composed jitted steps:
  align_step  — data-parallel only (sharding annotations; XLA keeps it
                local): seed→chain→records→flank scan→BC-UMI candidates
  match_step  — shard_map over ('data','wl'): local screen/rescore, then
                all_gather of per-shard summaries and a replicated global
                select; counts stay 'wl'-sharded with a 'data' psum.

Whitelist shards are padded to equal size; padded slots are masked out
after the screen (cand < n_real), so no phantom ties can occur.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..chemistry import BarcodeMatchSpec
from ..io import whitelist as wl
from ..io.encode import PAD, encode_batch
from ..ops.seed_screen import SeedTable, plan_for, screen
from ..ops.sw import NEG, sw_end2end
from ..stages.barcode import ACCEPT, BAD_UMI, LOW_AS, MULTIMAP, NO_CAND


def make_mesh(n_data: int, n_wl: int, devices: Sequence | None = None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_wl, "not enough devices"
    return Mesh(devices[:n_data * n_wl].reshape(n_data, n_wl),
                axis_names=("data", "wl"))


class ShardedWhitelist:
    """Whitelist partitioned over the 'wl' axis: per-shard padded refs and
    seed tables stacked on a leading shard axis."""

    def __init__(self, barcodes: np.ndarray, spec: BarcodeMatchSpec,
                 n_wl: int, jitter: int = 6, top_k: int = 8):
        self.spec = spec
        self.n_wl = n_wl
        self.top_k = top_k
        n = len(barcodes)
        per = -(-n // n_wl)
        pad_bc = "A" * spec.bc_len
        padded = list(barcodes) + [pad_bc] * (per * n_wl - n)
        self.n_total = n
        self.per_shard = per
        self.barcodes = np.asarray(padded)
        self.plan = plan_for(spec, spec.bc_query_offset, jitter)
        refs_list, tables = [], []
        maxocc = 1
        for s in range(n_wl):
            shard = self.barcodes[s * per:(s + 1) * per]
            codes, _ = encode_batch([b for b in shard], max_len=spec.bc_len)
            refs_np, ref_len = wl.padded_refs(shard, spec)
            t = SeedTable(codes.astype(np.int64), self.plan)
            refs_list.append(refs_np)
            tables.append(t)
            maxocc = max(maxocc, t.maxocc)
            self.ref_len = int(ref_len)
        self.maxocc = maxocc
        self.refs = np.stack(refs_list)                       # (n_wl, per, Lr)
        self.tabs = []
        for i in range(2):
            self.tabs.append({
                "starts": np.stack([t.starts[i] for t in tables]),
                "counts": np.stack([t.counts[i] for t in tables]),
                "entries": np.stack([t.entries[i] for t in tables]),
                "hkeys": np.stack([t.half_keys[i] for t in tables]),
            })
        # number of real (non-pad) barcodes per shard
        self.n_real = np.minimum(
            np.maximum(n - per * np.arange(n_wl), 0), per).astype(np.int32)

    def device_arrays(self, mesh: Mesh):
        sh = lambda spec_: NamedSharding(mesh, spec_)
        put = lambda x, s: jax.device_put(jnp.asarray(x), sh(s))
        arrs = dict(refs=put(self.refs, P("wl")),
                    n_real=put(self.n_real.reshape(self.n_wl, 1), P("wl")),
                    offsets=put((np.arange(self.n_wl, dtype=np.int32) *
                                 self.per_shard).reshape(self.n_wl, 1),
                                P("wl")))
        for i, t in enumerate(self.tabs):
            for k, v in t.items():
                arrs[f"{k}{i}"] = put(v, P("wl"))
        return arrs


def build_sharded_match(swl: ShardedWhitelist, mesh: Mesh):
    """shard_map'd whitelist matcher: candidates sharded over 'data',
    whitelist over 'wl'."""
    spec = swl.spec
    plan, top_k, maxocc = swl.plan, swl.top_k, swl.maxocc
    c, ulen, as_min = spec.umi_ref_offset, spec.umi_len, spec.as_min
    rlen_s = swl.ref_len

    def local(q, qlen, refs, n_real, offset,
              starts0, counts0, entries0, hkeys0,
              starts1, counts1, entries1, hkeys1):
        # leading wl-shard axis of size 1 inside the shard body
        refs, n_real, offset = refs[0], n_real[0], offset[0]
        starts0, counts0, entries0, hkeys0 = (starts0[0], counts0[0],
                                              entries0[0], hkeys0[0])
        starts1, counts1, entries1, hkeys1 = (starts1[0], counts1[0],
                                              entries1[0], hkeys1[0])
        B = q.shape[0]
        cand, cheap = screen(q, qlen, starts0, counts0, entries0, hkeys0,
                             starts1, counts1, entries1, hkeys1,
                             plan, top_k, maxocc)
        cand = jnp.where(cand < n_real, cand, -1)        # mask shard padding
        K = top_k
        has = cand >= 0
        ref_pairs = refs[jnp.clip(cand, 0, refs.shape[0] - 1)].reshape(B * K, -1)
        score, qpos, uvalid = sw_end2end(
            jnp.repeat(q, K, axis=0), jnp.repeat(qlen, K), ref_pairs,
            jnp.full((B * K,), rlen_s, jnp.int32), c,
            pad_left=spec.pad_left, full_len=rlen_s)
        score = jnp.where(has.reshape(-1), score, NEG).reshape(B, K)
        qpos = qpos.reshape(B, K)
        uvalid = uvalid.reshape(B, K)
        bk = jnp.argmax(score, axis=1)
        b_score = jnp.take_along_axis(score, bk[:, None], 1)[:, 0]
        b_bc = jnp.take_along_axis(cand, bk[:, None], 1)[:, 0]
        b_qpos = jnp.take_along_axis(qpos, bk[:, None], 1)[:, 0]
        b_uval = jnp.take_along_axis(uvalid, bk[:, None], 1)[:, 0]
        other = (cand != b_bc[:, None]) & has
        r_score = jnp.max(jnp.where(other, score, NEG), axis=1)
        any_cand = jnp.any(has, axis=1)
        b_bc_g = jnp.where(b_bc >= 0, b_bc + offset, -1)

        # ---- global combine over 'wl' ----
        g = lambda x: jax.lax.all_gather(x, "wl")        # (n_wl, B)
        scores_g = g(b_score)
        bcs_g = g(b_bc_g)
        runners_g = g(r_score)
        qpos_g = g(b_qpos)
        uval_g = g(b_uval)
        any_g = jnp.any(g(any_cand), axis=0)
        win = jnp.argmax(scores_g, axis=0)               # (B,)
        take = lambda x: jnp.take_along_axis(x, win[None, :], axis=0)[0]
        best_score = take(scores_g)
        best_bc = take(bcs_g)
        best_qpos = take(qpos_g)
        best_uval = take(uval_g)
        # runner-up: best of all shard-runners and non-winning shard bests
        nonwin = jnp.arange(scores_g.shape[0])[:, None] != win[None, :]
        runner = jnp.maximum(jnp.max(runners_g, axis=0),
                             jnp.max(jnp.where(nonwin, scores_g, NEG), axis=0))

        multimap = any_g & (runner == best_score) & (best_score > NEG)
        low = any_g & ~multimap & (best_score < as_min)
        umi_ok = best_uval & (best_qpos + ulen <= qlen) & (best_qpos >= 0)
        status = jnp.full((B,), NO_CAND, jnp.int32)
        status = jnp.where(any_g, LOW_AS, status)
        status = jnp.where(any_g & ~low & multimap, MULTIMAP, status)
        okk = any_g & ~low & ~multimap
        status = jnp.where(okk & umi_ok, ACCEPT,
                           jnp.where(okk, BAD_UMI, status))
        off = jnp.arange(ulen, dtype=jnp.int32)[None, :]
        uidx = jnp.clip(best_qpos[:, None] + off, 0, q.shape[1] - 1)
        umi = jnp.take_along_axis(q, uidx, axis=1)
        umi = jnp.where((status == ACCEPT)[:, None], umi, PAD)

        # per-shard counts of accepted reads (psum over data axis)
        local_bc = best_bc - offset
        mine = (status == ACCEPT) & (local_bc >= 0) & (local_bc < refs.shape[0])
        counts = jnp.zeros((refs.shape[0],), jnp.int32).at[
            jnp.clip(local_bc, 0, refs.shape[0] - 1)].add(mine.astype(jnp.int32))
        counts = jax.lax.psum(counts, "data")
        return best_bc, best_score, status, umi, counts[None, :]

    pspecs = dict(
        q=P("data"), qlen=P("data"), refs=P("wl"), n_real=P("wl"),
        offset=P("wl"), t=P("wl"))
    in_specs = (P("data"), P("data"), P("wl"), P("wl"), P("wl")) + (P("wl"),) * 8
    out_specs = (P("data"), P("data"), P("data"), P("data"), P("wl"))

    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


def build_sharded_align(spec, index, mesh, max_minimizers=128, S=2):
    """Data-parallel candidate extraction: reads sharded over 'data',
    replicated over 'wl'. Returns jitted fn(codes, lengths) → (cand codes
    (B*S, Lc), lengths, hit mask)."""
    import numpy as _np

    from ..align.aligner import prepare_index_arrays, seed_and_chain
    from ..io.encode import COMPLEMENT
    from ..ops.edit_distance import hw_locate
    from ..stages.device_step import _device_records
    from ..io.encode import encode as _encode

    idx_arrays = prepare_index_arrays(index)
    f = spec.flank
    pat = jnp.asarray(_encode(spec.scan.pattern))
    Lc = 96

    def fn(codes, lengths):
        B, L = codes.shape
        chain_out = seed_and_chain(codes, lengths, *idx_arrays,
                                   max_minimizers=max_minimizers)
        rec = _device_records(chain_out, lengths, S)
        R = B * S
        read_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), S)
        strand = rec["strand"].reshape(R)
        qstart = rec["qstart"].reshape(R)
        qend = rec["qend"].reshape(R)
        ok = rec["ok"].reshape(R)
        rlen = lengths[read_idx]
        s_qstart = jnp.where(strand == 1, rlen - qend, qstart)
        s_qend = jnp.where(strand == 1, rlen - qstart, qend)
        a = s_qstart if f.anchor == "qstart" else s_qend
        wstart = jnp.maximum(a + f.lo, 0)
        wend = jnp.minimum(a + f.hi, rlen)
        wlen = jnp.maximum(wend - wstart, 0)
        Wmax = f.hi - f.lo
        j = jnp.arange(Wmax, dtype=jnp.int32)[None, :]
        src = wstart[:, None] + j
        pos = jnp.where(strand[:, None] == 1, rlen[:, None] - 1 - src, src)
        base = codes[read_idx[:, None], jnp.clip(pos, 0, L - 1)]
        base = jnp.where(strand[:, None] == 1,
                         jnp.asarray(COMPLEMENT)[base], base)
        window = jnp.where((j < wlen[:, None]) & ok[:, None], base, PAD)
        ed, gs, ge = hw_locate(pat, window, wlen, spec.scan.k,
                               wildcard=spec.scan.n_wildcard,
                               pick_last=spec.scan.pick_last)
        hit = (ed >= 0) & (ed < spec.scan.max_ed_exclusive) & ok
        jj = jnp.arange(Lc, dtype=jnp.int32)[None, :]
        bidx = jnp.clip(gs[:, None] + jj, 0, Wmax - 1)
        blen = jnp.where(hit, jnp.clip(ge - gs, 0, Lc), 0)
        cand = jnp.where(jj < blen[:, None],
                         jnp.take_along_axis(window, bidx, axis=1), PAD)
        return cand.astype(jnp.int8), blen.astype(jnp.int32), hit

    data_sh = NamedSharding(mesh, P("data"))
    return jax.jit(fn, in_shardings=(data_sh, data_sh),
                   out_shardings=(data_sh, data_sh, data_sh))
