"""Multi-chip scale-out: data-parallel reads × model-parallel whitelist.

Replaces the reference's distributed story (seqkit split + multiprocessing
Pool + cat/JSON merges, SURVEY.md §2.3) with a jax.sharding Mesh:

  axis 'data' — read batches are sharded (the reference's shard
                data-parallelism); per-barcode count tensors merge with a
                psum over this axis (the reference's JSON dict-sum,
                utils.py:1419-1431)
  axis 'wl'   — the whitelist (737K/3M barcodes) is partitioned across
                chips; each shard resolves its local barcodes EXACTLY
                (tier hash passes + exhaustive one-vs-all DP,
                stages/barcode semantics) and the per-read summaries
                all-gather over 'wl' for the global unique-best decision
                (the argmax all-reduce of SURVEY.md §2.3)

The merge is exact because every shard-local quantity merges losslessly:
tier distinct-counts SUM over disjoint shards, DP bests MAX with
tie-counts summed at the global best and smallest-index winners, and the
reverse-strand best MAXes.  A sharded run is bit-identical to the
single-chip matcher (tests/test_sharded.py).

Two composed jitted steps:
  align_step  — data-parallel only (sharding annotations; XLA keeps it
                local): seed→chain→records→flank scan→BC-UMI candidates
  match_step  — shard_map over ('data','wl'): local tiers + local DP,
                all_gather merges, replicated global verdicts; counts
                stay 'wl'-sharded with a 'data' psum.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..chemistry import BarcodeMatchSpec
from ..io import whitelist as wl
from ..io.encode import COMPLEMENT, PAD, encode_batch
from ..ops.sw import NEG, sw_end2end
from ..ops.whitelist_verify import verify_all
from ..stages.barcode import (ACCEPT, N_TIERS, boundary_flags,
                              combine_verdicts, revcomp_rows, tier_hits)

BIGI = np.int32(1 << 30)


def make_mesh(n_data: int, n_wl: int, devices: Sequence | None = None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_wl, "not enough devices"
    return Mesh(devices[:n_data * n_wl].reshape(n_data, n_wl),
                axis_names=("data", "wl"))


class ShardedWhitelist:
    """Whitelist partitioned over the 'wl' axis: per-shard padded refs
    (winner UMI rescore), core columns (exhaustive DP), and sorted
    exact/ins1 key tables (tier passes).  Shards pad to equal size;
    padding rows are masked by n_real / idx<0 sentinels."""

    def __init__(self, barcodes: np.ndarray, spec: BarcodeMatchSpec,
                 n_wl: int, dp_chunk: int = 256, **_compat):
        self.spec = spec
        self.n_wl = n_wl
        self.dp_chunk = dp_chunk
        n = len(barcodes)
        per = -(-n // n_wl)
        pad_bc = "A" * spec.bc_len
        padded = list(barcodes) + [pad_bc] * (per * n_wl - n)
        self.n_total = n
        self.per_shard = per
        self.barcodes = np.asarray(padded)
        self.core_len = spec.umi_ref_offset - spec.pad_left
        refs_list, core_list = [], []
        for s in range(n_wl):
            shard = self.barcodes[s * per:(s + 1) * per]
            refs_np, ref_len = wl.padded_refs(shard, spec)
            refs_list.append(refs_np)
            core_list.append(np.ascontiguousarray(
                refs_np[:, spec.pad_left:spec.umi_ref_offset].T))
            self.ref_len = int(ref_len)
        self.refs = np.stack(refs_list)                   # (n_wl, per, Lr)
        self.coreT = np.stack(core_list)                  # (n_wl, m, per)
        # number of real (non-pad) barcodes per shard
        self.n_real = np.minimum(
            np.maximum(n - per * np.arange(n_wl), 0), per).astype(np.int32)

        # per-shard sorted key tables (tier passes). Padding rows get
        # sentinel key 0xFFFFFFFF with idx -1 (never counted); stable
        # real-first ordering keeps searchsorted-left correct even if a
        # real barcode shares the sentinel key value.
        self.exact = None
        if not spec.slideseq_linker and spec.bc_len <= 16:
            ek = np.full((n_wl, per), 0xFFFFFFFF, np.uint32)
            ei = np.full((n_wl, per), -1, np.int32)
            rk = np.full((n_wl, per), 0xFFFFFFFF, np.uint32)
            ri = np.full((n_wl, per), -1, np.int32)
            # boundary-truncation tables (stages/barcode.boundary_flags):
            # per-shard sorted keys of the 1-/2-truncated cores; the
            # 0xFFFFFFFF sentinel exceeds every (m-1)/(m-2)-char key, so
            # pad rows never match
            bnd_names = ("b_suf1", "b_suf2", "b_pre1", "b_pre2",
                         "b_rc_suf1", "b_rc_suf2", "b_rc_pre1",
                         "b_rc_pre2")
            bnd = {k: np.full((n_wl, per), 0xFFFFFFFF, np.uint32)
                   for k in bnd_names}

            def pk(cds):
                k = np.zeros(cds.shape[0], np.uint32)
                for t in range(cds.shape[1]):
                    k = (k << np.uint32(2)) | cds[:, t].astype(np.uint32)
                return np.sort(k)

            for s in range(n_wl):
                nr = int(self.n_real[s])
                shard = self.barcodes[s * per: s * per + nr]
                codes, _ = encode_batch([b for b in shard],
                                        max_len=spec.bc_len)
                rc_codes = COMPLEMENT[codes][:, ::-1]
                keys = np.zeros(nr, np.uint32)
                rkeys = np.zeros(nr, np.uint32)
                for t in range(spec.bc_len):
                    keys = (keys << np.uint32(2)) | codes[:, t].astype(np.uint32)
                    rkeys = (rkeys << np.uint32(2)) | \
                        rc_codes[:, t].astype(np.uint32)
                order = np.argsort(keys, kind="stable")
                ek[s, :nr] = keys[order]
                ei[s, :nr] = order
                rk[s, :nr] = np.sort(rkeys)
                ri[s, :nr] = 0
                for name, cds in (("b_suf1", codes[:, 1:]),
                                  ("b_suf2", codes[:, 2:]),
                                  ("b_pre1", codes[:, :-1]),
                                  ("b_pre2", codes[:, :-2]),
                                  ("b_rc_suf1", rc_codes[:, 1:]),
                                  ("b_rc_suf2", rc_codes[:, 2:]),
                                  ("b_rc_pre1", rc_codes[:, :-1]),
                                  ("b_rc_pre2", rc_codes[:, :-2])):
                    bnd[name][s, :nr] = pk(cds)
            self.exact = {"ex_keys": ek, "ex_idx": ei, "rc_ex_keys": rk,
                          "rc_ex_idx": ri, **bnd}

    def device_arrays(self, mesh: Mesh):
        sh = lambda spec_: NamedSharding(mesh, spec_)
        put = lambda x, s: jax.device_put(jnp.asarray(x), sh(s))
        arrs = dict(refs=put(self.refs, P("wl")),
                    coreT=put(self.coreT, P("wl")),
                    n_real=put(self.n_real.reshape(self.n_wl, 1), P("wl")),
                    offsets=put((np.arange(self.n_wl, dtype=np.int32) *
                                 self.per_shard).reshape(self.n_wl, 1),
                                P("wl")))
        if self.exact is not None:
            for k, v in self.exact.items():
                arrs[k] = put(v, P("wl"))
        return arrs


def build_sharded_match(swl: ShardedWhitelist, mesh: Mesh):
    """shard_map'd whitelist matcher: candidates sharded over 'data',
    whitelist over 'wl'.  Exact tier passes + chunked exhaustive DP per
    shard, lossless merges over 'wl' (see module docstring)."""
    spec = swl.spec
    per = swl.per_shard
    m = swl.core_len
    rlen_s = swl.ref_len
    ulen = spec.umi_len

    def local(q, qlen, arrs):
        # leading wl-shard axis of size 1 inside the shard body
        a = {k: v[0] for k, v in arrs.items()}
        refs = a["refs"]
        n_real = a["n_real"][0]
        offset = a["offsets"][0]
        B = q.shape[0]
        g = lambda x: jax.lax.all_gather(x, "wl")        # (n_wl, B)

        def min_with_payload(val_l, pay_l):
            """Global min of val (with +offset ids) and the payload from
            the owning shard."""
            vg = g(val_l)
            win = jnp.argmin(vg, axis=0)
            v = jnp.take_along_axis(vg, win[None, :], axis=0)[0]
            p = jnp.take_along_axis(g(pay_l), win[None, :], axis=0)[0]
            return v, p

        # ---- tier passes (global merge over disjoint shards: any = OR;
        # multi = any shard multi OR hits in >=2 shards — shard ids are
        # disjoint, so cross-shard hits are automatically distinct;
        # smallest global id wins, its eqpos rides along)
        tiers = None
        tier_hit = jnp.zeros((B,), bool)
        if "ex_keys" in arrs:
            bl = spec.bc_len
            fwd_l = tier_hits(q, qlen, a["ex_keys"], a["ex_idx"], bl,
                              spec.pad_left, spec.pad_right)
            rc_l = tier_hits(q, qlen, a["rc_ex_keys"], a["rc_ex_idx"], bl,
                             spec.pad_right, spec.pad_left, any_only=True)
            # boundary-truncation flag: local structures OR'd over 'wl';
            # flagged candidates bypass the tier summaries entirely
            # (free core entry/exit at the query edges — see
            # stages/barcode.boundary_flags)
            fl_l = boundary_flags(
                q, qlen, (a["b_suf1"], a["b_suf2"], a["b_pre1"],
                          a["b_pre2"]), bl, spec.pad_left, spec.pad_right)
            fl_l = fl_l | boundary_flags(
                q, qlen, (a["b_rc_suf1"], a["b_rc_suf2"], a["b_rc_pre1"],
                          a["b_rc_pre2"]), bl, spec.pad_right,
                spec.pad_left)
            keep = ~(jnp.any(g(fl_l), axis=0) |
                     ((qlen > 0) & (qlen <= bl + 1)))
            fwd_g, rc_g = [], []
            for t in range(N_TIERS):
                any_l, multi_l, ebc_l, eq_l = fwd_l[t]
                anys = g(any_l)
                any_t = jnp.any(anys, axis=0) & keep
                multi_t = jnp.any(g(multi_l), axis=0) | \
                    (jnp.sum(anys.astype(jnp.int32), axis=0) >= 2)
                ebc_t, eq_t = min_with_payload(
                    jnp.where(ebc_l >= 0, ebc_l + offset, BIGI), eq_l)
                ebc_t = jnp.where(any_t, ebc_t, -1)
                fwd_g.append((any_t, multi_t, ebc_t, eq_t))
                r_t = jnp.any(g(rc_l[t]), axis=0) & keep
                rc_g.append(r_t)
                tier_hit = tier_hit | any_t | r_t
            tiers = (fwd_g, rc_g)

        # ---- exhaustive DP tail, chunked; every shard loops the same
        # (global) flag set so the in-loop collectives stay aligned
        M = min(swl.dp_chunk, B)
        need_dp = (qlen > 0) & ~tier_hit
        order = jnp.argsort(jnp.where(need_dp, 0, 1).astype(jnp.int32),
                            stable=True)
        n_flag = jnp.sum(need_dp.astype(jnp.int32))
        banded = jax.default_backend() != "cpu"
        pad_left = spec.pad_left if banded else None
        full_len = rlen_s if banded else None

        init = (jnp.full((B,), NEG, jnp.int32),
                jnp.full((B,), -1, jnp.int32),
                jnp.zeros((B,), jnp.int32),
                jnp.full((B,), NEG, jnp.int32),
                jnp.full((B,), -1, jnp.int32),
                jnp.zeros((B,), bool),
                jnp.int32(0))

        def cond(state):
            return state[-1] * M < n_flag

        def body(state):
            fb, fidx, fties, rb, fqpos, fuval, k = state
            rows = jax.lax.dynamic_slice(order, (k * M,), (M,))
            slot_ok = (k * M + jnp.arange(M, dtype=jnp.int32)) < n_flag
            qs = q[rows]
            qls = jnp.where(slot_ok, qlen[rows], 0)
            qrc = revcomp_rows(qs, qls)
            best, idx, ties = verify_all(
                jnp.concatenate([qs, qrc], axis=0),
                jnp.concatenate([qls, qls]), a["coreT"], n_real,
                spec.pad_left, spec.pad_right)
            fb_l, rb_l = best[:M], best[M:]
            fi_lg = jnp.where(idx[:M] >= 0, idx[:M] + offset, BIGI)
            ft_l = ties[:M]
            # merge over 'wl': best fwd/rc MAX; ties SUM at the global
            # best; smallest global index among best shards
            fbg = g(fb_l)                                # (n_wl, M)
            fb_c = jnp.max(fbg, axis=0)
            at_best = fbg == fb_c[None, :]
            ft_c = jnp.sum(jnp.where(at_best, g(ft_l), 0), axis=0)
            fi_c = jnp.min(jnp.where(at_best, g(fi_lg), BIGI), axis=0)
            rb_c = jnp.max(g(rb_l), axis=0)
            # winner UMI rescore on the owning shard
            li = fi_c - offset
            own = (li >= 0) & (li < per)
            ref_rows = refs[jnp.clip(li, 0, per - 1)]
            sc2, qp_l, uv_l = sw_end2end(
                qs, qls, ref_rows, jnp.full((M,), rlen_s, jnp.int32),
                spec.umi_ref_offset, pad_left=pad_left, full_len=full_len)
            qp_c = jnp.max(g(jnp.where(own, qp_l, -BIGI)), axis=0)
            uv_c = jnp.any(g(uv_l & own), axis=0)
            tgt = jnp.where(slot_ok, rows, B)
            fb = fb.at[tgt].set(fb_c, mode="drop")
            fidx = fidx.at[tgt].set(
                jnp.where(fi_c < BIGI, fi_c, -1), mode="drop")
            fties = fties.at[tgt].set(ft_c, mode="drop")
            rb = rb.at[tgt].set(rb_c, mode="drop")
            fqpos = fqpos.at[tgt].set(jnp.maximum(qp_c, -1), mode="drop")
            fuval = fuval.at[tgt].set(uv_c, mode="drop")
            return fb, fidx, fties, rb, fqpos, fuval, k + 1

        fb, fidx, fties, rb, fqpos, fuval, _ = jax.lax.while_loop(
            cond, body, init)

        bc, score, status, umi, qpos = combine_verdicts(
            q, qlen, spec, m, tiers,
            (need_dp, fb, fidx, fties, rb, fqpos, fuval))

        # per-shard counts of accepted reads (psum over data axis)
        local_bc = bc - offset
        mine = (status == ACCEPT) & (local_bc >= 0) & (local_bc < per)
        counts = jnp.zeros((per,), jnp.int32).at[
            jnp.clip(local_bc, 0, per - 1)].add(mine.astype(jnp.int32))
        counts = jax.lax.psum(counts, "data")
        return bc, score, status, umi, counts[None, :]

    arr_keys = ["refs", "coreT", "n_real", "offsets"]
    if swl.exact is not None:
        arr_keys += list(swl.exact)
    in_specs = (P("data"), P("data"), {k: P("wl") for k in arr_keys})
    out_specs = (P("data"), P("data"), P("data"), P("data"), P("wl"))

    fn = jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    return jax.jit(fn)


def build_sharded_align(spec, index, mesh, max_minimizers=128, S=2):
    """Data-parallel candidate extraction: reads sharded over 'data',
    replicated over 'wl'. Returns jitted fn(codes, lengths) → (cand codes
    (B*S, Lc), lengths, hit mask)."""
    from ..align.aligner import prepare_index_arrays, seed_and_chain
    from ..io.encode import encode as _encode
    from ..ops.edit_distance import hw_locate
    from ..stages.device_step import _device_records

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
