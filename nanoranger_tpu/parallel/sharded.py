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
from ..ops.seed_screen import plan_for
from ..ops.sw import NEG, sw_end2end
from ..stages.barcode import ACCEPT, BAD_UMI, LOW_AS, MULTIMAP, NO_CAND


def make_mesh(n_data: int, n_wl: int, devices: Sequence | None = None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= n_data * n_wl, "not enough devices"
    return Mesh(devices[:n_data * n_wl].reshape(n_data, n_wl),
                axis_names=("data", "wl"))


class ShardedWhitelist:
    """Whitelist partitioned over the 'wl' axis: per-shard padded refs,
    PRODUCT screen tables (ops/product_screen — the same screen the
    single-chip matcher uses; per-shard tables pad to equal shapes so they
    stack on the shard axis), and reverse-strand tables (revcomp'd refs +
    a product table over the revcomp'd barcode structure — STAR searches
    both strands, scripts/barcode_align.sh:14-35)."""

    def __init__(self, barcodes: np.ndarray, spec: BarcodeMatchSpec,
                 n_wl: int, jitter: int = 6, top_k: int = 8):
        from ..io.encode import COMPLEMENT
        from ..ops.product_screen import ProductTable
        from ..stages.barcode import rc_half_layout
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
        s_len, rc_bounds, rc_deltas = rc_half_layout(spec)
        self.rc_plan = type(self.plan)(s_len, rc_bounds, rc_deltas,
                                       spec.rc_query_offset, jitter)
        self.c_rc = spec.pad_right + s_len
        refs_list, rc_refs_list, prods, rc_prods = [], [], [], []
        for s in range(n_wl):
            shard = self.barcodes[s * per:(s + 1) * per]
            codes, _ = encode_batch([b for b in shard], max_len=spec.bc_len)
            refs_np, ref_len = wl.padded_refs(shard, spec)
            refs_rc_np = COMPLEMENT[refs_np][:, ::-1]
            struct_rc = refs_rc_np[:, spec.pad_right:spec.pad_right + s_len]
            prods.append(ProductTable.build(
                codes.astype(np.int64), self.plan.half_bounds,
                self.plan.q_deltas))
            rc_prods.append(ProductTable.build(
                struct_rc.astype(np.int64), rc_bounds, rc_deltas))
            assert prods[-1] is not None and rc_prods[-1] is not None, \
                "per-shard pair table exceeds PAIR_LIMIT — raise wl_shards"
            refs_list.append(refs_np)
            rc_refs_list.append(refs_rc_np)
            self.ref_len = int(ref_len)
        self.refs = np.stack(refs_list)                       # (n_wl, per, Lr)
        self.rc_refs = np.stack(rc_refs_list)
        self.prod = self._stack_products(prods)
        self.rc_prod = self._stack_products(rc_prods)
        self.prod_meta = (prods[0].q_delta2, prods[0].l1, prods[0].l2)
        self.rc_meta = (rc_prods[0].q_delta2, rc_prods[0].l1, rc_prods[0].l2)
        # number of real (non-pad) barcodes per shard
        self.n_real = np.minimum(
            np.maximum(n - per * np.arange(n_wl), 0), per).astype(np.int32)

        # per-shard exact-window key tables (stages/barcode
        # exact_window_hits): the whole-candidate score-16 pass. Padding
        # rows get sentinel key 0xFFFFFFFF with idx -1 (never counted);
        # stable real-first ordering keeps searchsorted-left correct even
        # if a real barcode shares the sentinel key value.
        self.exact = None
        if not spec.slideseq_linker and spec.bc_len <= 16:
            ek = np.full((n_wl, per), 0xFFFFFFFF, np.uint32)
            ei = np.full((n_wl, per), -1, np.int32)
            rk = np.full((n_wl, per), 0xFFFFFFFF, np.uint32)
            ri = np.full((n_wl, per), -1, np.int32)
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
            self.exact = {"ex_keys": ek, "ex_idx": ei, "rc_ex_keys": rk,
                          "rc_ex_idx": ri}

    @staticmethod
    def _stack_products(prods):
        """Stack per-shard ProductTables, zero/-1-padding distinct-half
        dimensions to the max so shapes match across shards (padded pair
        entries are -1 → screened candidates mask out naturally)."""
        n1 = max(p.n1 for p in prods)
        n2 = max(p.n2 for p in prods)
        p1 = np.zeros((len(prods), prods[0].planes1.shape[0], n1), np.int8)
        p2 = np.zeros((len(prods), prods[0].planes2.shape[0], n2), np.int8)
        pair = np.full((len(prods), n1, n2), -1, np.int32)
        for s, p in enumerate(prods):
            p1[s, :, :p.n1] = p.planes1
            p2[s, :, :p.n2] = p.planes2
            pair[s, :p.n1, :p.n2] = p.pair
        return {"planes1": p1, "planes2": p2, "pair": pair}

    def device_arrays(self, mesh: Mesh):
        sh = lambda spec_: NamedSharding(mesh, spec_)
        put = lambda x, s: jax.device_put(jnp.asarray(x), sh(s))
        arrs = dict(refs=put(self.refs, P("wl")),
                    rc_refs=put(self.rc_refs, P("wl")),
                    n_real=put(self.n_real.reshape(self.n_wl, 1), P("wl")),
                    offsets=put((np.arange(self.n_wl, dtype=np.int32) *
                                 self.per_shard).reshape(self.n_wl, 1),
                                P("wl")))
        for tag, t in (("p", self.prod), ("r", self.rc_prod)):
            for k, v in t.items():
                arrs[f"{tag}_{k}"] = put(v, P("wl"))
        if self.exact is not None:
            for k, v in self.exact.items():
                arrs[k] = put(v, P("wl"))
        return arrs


def build_sharded_match(swl: ShardedWhitelist, mesh: Mesh):
    """shard_map'd whitelist matcher: candidates sharded over 'data',
    whitelist over 'wl'. Screens with the product screen (same as the
    single-chip matcher) and runs the reverse-strand pass (all-gathered
    rc best; STAR both-strand semantics)."""
    from ..ops.product_screen import product_screen, product_screen_joint
    from ..stages.barcode import RC_BEST
    spec = swl.spec
    plan, top_k = swl.plan, swl.top_k
    jitter = plan.jitter
    c, ulen, as_min = spec.umi_ref_offset, spec.umi_len, spec.as_min
    rlen_s = swl.ref_len
    qd2, l1, l2 = swl.prod_meta
    rqd2, rl1, rl2 = swl.rc_meta
    rc_nominal, c_rc = swl.rc_plan.nominal, swl.c_rc

    def local(q, qlen, arrs):
        # leading wl-shard axis of size 1 inside the shard body
        a = {k: v[0] for k, v in arrs.items()}
        refs, rc_refs = a["refs"], a["rc_refs"]
        n_real, offset = a["n_real"], a["offsets"]
        p_planes1, p_planes2, p_pair = a["p_planes1"], a["p_planes2"], \
            a["p_pair"]
        r_planes1, r_planes2, r_pair = a["r_planes1"], a["r_planes2"], \
            a["r_pair"]
        B = q.shape[0]
        cand, cheap = product_screen(q, qlen, p_planes1, p_planes2, p_pair,
                                     plan.nominal, jitter, qd2, l1, l2,
                                     top_t=max(top_k, 8),
                                     top_k=max(2 * top_k, 16))
        # wide-offset joint pass (see ops/product_screen_joint): near-
        # perfect loci far from the nominal offset
        wbc, _ = product_screen_joint(q, qlen, p_planes1, p_planes2,
                                      p_pair, 0, spec.pad_left, qd2,
                                      l1, l2)
        cand = jnp.concatenate([cand, wbc], axis=1)
        K = cand.shape[1]
        cand = jnp.where(cand < n_real, cand, -1)        # mask shard padding
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

        # ---- local reverse-strand best (same screen on revcomp'd refs)
        cand_r, _ = product_screen(q, qlen, r_planes1, r_planes2, r_pair,
                                   rc_nominal, jitter, rqd2, rl1, rl2,
                                   top_t=8, top_k=8)
        wbc_r, _ = product_screen_joint(q, qlen, r_planes1, r_planes2,
                                        r_pair, 0, spec.pad_right, rqd2,
                                        rl1, rl2)
        cand_r = jnp.concatenate([cand_r, wbc_r], axis=1)
        cand_r = jnp.where(cand_r < n_real, cand_r, -1)
        Kr = cand_r.shape[1]
        has_r = cand_r >= 0
        rr = rc_refs[jnp.clip(cand_r, 0, rc_refs.shape[0] - 1)] \
            .reshape(B * Kr, -1)
        score_r, _, _ = sw_end2end(
            jnp.repeat(q, Kr, axis=0), jnp.repeat(qlen, Kr), rr,
            jnp.full((B * Kr,), rlen_s, jnp.int32), c_rc,
            pad_left=spec.pad_right, full_len=rlen_s)
        rc_local = jnp.max(jnp.where(has_r.reshape(-1), score_r,
                                     NEG).reshape(B, Kr), axis=1)

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

        # ---- whole-candidate exact pass (stages/barcode
        # exact_window_hits): shard-local distinct counts SUM across the
        # disjoint whitelist shards; the unique exact barcode (global min
        # id) overrides lower-scoring screened verdicts and second
        # score-16 loci multimap-drop — same semantics as the single-chip
        # matcher's apply_exact
        rc_exact_any = None
        if "ex_keys" in arrs:
            from ..stages.barcode import (exact_window_any,
                                          exact_window_hits)
            bl = spec.bc_len
            nd_l, ebc_l, eqpos_l = exact_window_hits(
                q, qlen, a["ex_keys"], a["ex_idx"], bl,
                spec.pad_left, spec.pad_right)
            BIGE = jnp.int32(1 << 30)
            ebc_lg = jnp.where(ebc_l >= 0, ebc_l + offset, BIGE)
            nd = jnp.sum(g(nd_l), axis=0)
            ebc_g2 = g(ebc_lg)
            win_e = jnp.argmin(ebc_g2, axis=0)
            ebc = jnp.take_along_axis(ebc_g2, win_e[None, :], axis=0)[0]
            eqpos = jnp.take_along_axis(g(eqpos_l), win_e[None, :],
                                        axis=0)[0]
            eany = nd >= 1
            s16 = jnp.int32(bl)
            tie = (nd >= 2) | (eany & (best_score == s16) & (best_bc != ebc))
            better = eany & (best_score < s16)
            best_score = jnp.where(eany, s16, best_score)
            best_bc = jnp.where(better, ebc, best_bc)
            u_ok_e = (eqpos >= 0) & (eqpos + ulen <= qlen)
            status = jnp.where(better,
                               jnp.where(u_ok_e, ACCEPT, BAD_UMI), status)
            best_qpos = jnp.where(better, eqpos, best_qpos)
            status = jnp.where(tie, MULTIMAP, status)
            rc_exact_any = exact_window_any(
                q, qlen, a["rc_ex_keys"], bl, spec.pad_right,
                spec.pad_left, idx_sorted=a["rc_ex_idx"])

        # reverse-strand suppression (global rc best over 'wl'):
        # rc > fwd → STAR flag-16 row the reference rejects; tie → 2 loci
        rc_best = jnp.max(jax.lax.all_gather(rc_local, "wl"), axis=0)
        if rc_exact_any is not None:
            rc_any_g = jnp.any(g(rc_exact_any), axis=0)
            rc_best = jnp.maximum(
                rc_best, jnp.where(rc_any_g, jnp.int32(spec.bc_len), NEG))
        status = jnp.where(rc_best > best_score, RC_BEST, status)
        status = jnp.where((rc_best == best_score) & (rc_best > NEG),
                           MULTIMAP, status)
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

    arr_keys = ["refs", "rc_refs", "n_real", "offsets",
                "p_planes1", "p_planes2", "p_pair",
                "r_planes1", "r_planes2", "r_pair"]
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
