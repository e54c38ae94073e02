"""Deconcatenation / BC-UMI extraction stage.

One ChemistrySpec-driven engine replacing the reference's seven decon_*
functions (utils.py:44-94,97-176,179-299,302-368,371-486,982-1113,
1283-1409). Per alignment record (primary AND supplementary — the -Y
chimera/concatemer recovery, README.md:17-22):

  1. work in SAM-stored orientation: strand-1 records see the reverse
     complement and reversed quals, with flipped qstart/qend — exactly what
     pysam shows the reference (utils.py:151-157 flips them back for the
     read-name metadata)
  2. gather the chemistry's flank window next to the aligned span
  3. adapter motif scan (ops/edit_distance.py == edlib.align 'HW')
     — whole-flank for 5' modes, sliding sub-windows (first hit wins) for
     3' modes
  4. slice the transcript subread and BC-UMI candidate per the chemistry's
     rules + acceptance predicates

The heavy step (2+3) is one jitted device computation over all records;
slicing/assembly is vectorized numpy at the host boundary where variable-
length strings must be written anyway.

Deviation note: python negative-index wraparound in the reference
(end_qu[start-35:...] when start<35, utils.py:1068,1374; seq[qend-70:...]
when qend<70, utils.py:1322) silently yields empty/garbage slices that
the length filters then drop; we clamp instead and drop explicitly —
same records rejected, without the wraparound garbage.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..align.aligner import AlignmentRecords
from ..chemistry import ChemistrySpec
from ..io.encode import COMPLEMENT, PAD, decode, encode
from ..ops.edit_distance import hw_locate

# batch code→ASCII table + bytes-level revcomp (assembly is bytes
# slicing, not per-row numpy decode — round-4 VERDICT #9)
_CODE_TO_ASCII = np.frombuffer(b"ACGTN.", dtype=np.uint8).copy()
_RC_TABLE = bytes.maketrans(b"ACGTN.", b"TGCAN.")


# --------------------------------------------------------------------------
# device flank scan

@functools.partial(
    jax.jit,
    static_argnames=("anchor", "lo", "hi", "pattern", "k", "wildcard",
                     "pick_last", "wsize", "stride", "plus_one"))
def _scan_flanks(codes, lengths, read_idx, strand, qstart, qend,
                 anchor, lo, hi, pattern, k, wildcard, pick_last,
                 wsize, stride, plus_one):
    """Gather per-record flank windows in stored orientation and run the
    adapter scan. Returns (window (R, Wmax) int8, wlen, wstart, ed, gstart,
    gend) — gstart/gend are edlib locations within the flank window
    (gend INCLUSIVE), ed = -1 when no hit."""
    R = read_idx.shape[0]
    L = codes.shape[1]
    rlen = lengths[read_idx]
    # stored-orientation span
    s_qstart = jnp.where(strand == 1, rlen - qend, qstart)
    s_qend = jnp.where(strand == 1, rlen - qstart, qend)
    a = jnp.where(anchor == 0, s_qstart, s_qend)  # anchor: 0=qstart 1=qend
    wstart = jnp.maximum(a + lo, 0)
    wend = jnp.minimum(a + hi, rlen)
    wlen = jnp.maximum(wend - wstart, 0)

    Wmax = hi - lo
    j = jnp.arange(Wmax, dtype=jnp.int32)[None, :]
    src = wstart[:, None] + j
    pos = jnp.where(strand[:, None] == 1, rlen[:, None] - 1 - src, src)
    pos = jnp.clip(pos, 0, L - 1)
    base = codes[read_idx[:, None], pos]
    comp = jnp.asarray(COMPLEMENT)
    base = jnp.where(strand[:, None] == 1, comp[base], base)
    window = jnp.where(j < wlen[:, None], base, PAD).astype(jnp.int8)

    pat = jnp.asarray(np.frombuffer(bytes(pattern), dtype=np.int8))
    if wsize is None:
        ed, gs, ge = hw_locate(pat, window, wlen, k,
                               wildcard=wildcard, pick_last=pick_last)
    else:
        n_win = (Wmax // stride) + (1 if plus_one else 0)
        i_w = jnp.arange(n_win, dtype=jnp.int32)
        jj = jnp.arange(wsize, dtype=jnp.int32)
        sub_src = i_w[:, None] * stride + jj[None, :]        # (n_win, wsize)
        subs = window[jnp.arange(R)[:, None, None],
                      jnp.clip(sub_src, 0, Wmax - 1)[None, :, :]]
        subs = subs.reshape(R * n_win, wsize)
        # window i exists per reference loop bounds
        if plus_one:
            w_exists = (i_w[None, :] * stride) <= wlen[:, None]
        else:
            w_exists = i_w[None, :] < (wlen[:, None] // stride)
        sub_len = jnp.clip(wlen[:, None] - i_w[None, :] * stride, 0, wsize)
        sub_len = jnp.where(w_exists, sub_len, 0)
        ed_w, gs_w, ge_w = hw_locate(pat, subs, sub_len.reshape(-1), k,
                                     wildcard=wildcard, pick_last=pick_last)
        ed_w = ed_w.reshape(R, n_win)
        gs_w = gs_w.reshape(R, n_win)
        ge_w = ge_w.reshape(R, n_win)
        hit_w = ed_w >= 0
        first = jnp.argmax(hit_w, axis=1)
        found = jnp.any(hit_w, axis=1)
        pickcol = first[:, None]
        ed = jnp.where(found, jnp.take_along_axis(ed_w, pickcol, axis=1)[:, 0], -1)
        off = first.astype(jnp.int32) * stride
        gs = jnp.where(found, jnp.take_along_axis(gs_w, pickcol, axis=1)[:, 0] + off, -1)
        ge = jnp.where(found, jnp.take_along_axis(ge_w, pickcol, axis=1)[:, 0] + off, -1)
    return window, wlen, wstart, ed, gs, ge


# --------------------------------------------------------------------------

@dataclasses.dataclass
class DeconResult:
    """Host-side decon products for one batch."""
    # accepted transcript subreads (reference _deconcat/_VDJ fastq)
    sub_rec: np.ndarray          # indices into the AlignmentRecords
    sub_names: list
    sub_seqs: list               # str
    sub_quals: list              # str
    # BC-UMI candidates (reference _BCUMI fasta)
    bcumi_rec: np.ndarray
    bcumi_names: list
    bcumi_seqs: list             # str
    # per-mode stats
    eds_rows: list               # mode-specific tuples for _eds.csv
    raw_bc_counts: dict          # 3p10XGEX bcumi[3:19] counter (utils.py:1376)
    polyA: list                  # slideseq (name, polyA) rows
    # record indices backing eds_rows / raw count keys — lets the fused
    # CLI path regroup a deferred read's rows at its read position
    # (stages/cli_step.assemble_batch)
    eds_rec: np.ndarray | None = None
    raw_rows: list | None = None          # [(record_idx, key), ...]


def _anchor_code(name: str) -> int:
    return 0 if name == "qstart" else 1


def run_decon(spec: ChemistrySpec, codes: np.ndarray, lengths: np.ndarray,
              names: list, quals: list, rec: AlignmentRecords,
              ref_names: list, sample: str = "sample",
              dev_codes=None, min_bucket: int = 0) -> DeconResult:
    """Run decon for one read batch + its alignment records.

    dev_codes: optional device-resident copy of `codes` (from the aligner
    call) — passing it avoids re-uploading the batch for the flank scan."""
    R = len(rec)
    empty = DeconResult(np.zeros(0, int), [], [], [], np.zeros(0, int), [], [],
                        [], {}, [])
    if R == 0:
        return empty

    read_idx = rec.read_idx.astype(np.int32)
    strand = rec.strand.astype(np.int32)
    qstart = rec.qstart.astype(np.int32)
    qend = rec.qend.astype(np.int32)
    rlen = lengths[read_idx].astype(np.int64)
    s_qstart = np.where(strand == 1, rlen - qend, qstart)
    s_qend = np.where(strand == 1, rlen - qstart, qend)
    qlen = s_qend - s_qstart

    # ---- adapter scan on device -----------------------------------------
    if spec.scan is not None:
        f = spec.flank
        # pad the record axis to a pow2 bucket: R varies per batch and an
        # exact-R shape would recompile _scan_flanks every batch (~1.3s on
        # a remote-compile backend). Pad rows scan read 0's empty window
        # (qstart=qend=0 → wlen may be >0 but results are sliced off).
        # min_bucket pins the bucket (fallback prewarm — see pipeline)
        Rb = max(256, min_bucket)
        while Rb < R:
            Rb *= 2
        pad = Rb - R
        pad_i32 = lambda a: np.pad(a.astype(np.int32), (0, pad))
        window, wlen, wstart, ed, gs, ge = _scan_flanks(
            dev_codes if dev_codes is not None else jnp.asarray(codes),
            jnp.asarray(lengths.astype(np.int32)),
            jnp.asarray(pad_i32(read_idx)), jnp.asarray(pad_i32(strand)),
            jnp.asarray(pad_i32(qstart)), jnp.asarray(pad_i32(qend)),
            anchor=_anchor_code(f.anchor), lo=f.lo, hi=f.hi,
            pattern=encode(spec.scan.pattern).tobytes(),
            k=spec.scan.k, wildcard=spec.scan.n_wildcard,
            pick_last=spec.scan.pick_last,
            wsize=spec.scan.window_size, stride=spec.scan.window_stride,
            plus_one=spec.scan.windows_plus_one)
        window = np.asarray(window)[:R]
        wlen = np.asarray(wlen)[:R]
        wstart = np.asarray(wstart)[:R]
        ed = np.asarray(ed)[:R]
        gs = np.asarray(gs)[:R]
        ge = np.asarray(ge)[:R]
        hit = (ed >= 0) & (ed < spec.scan.max_ed_exclusive)
    else:
        window = np.zeros((R, 0), np.int8)
        wlen = np.zeros(R, np.int64)
        wstart = np.zeros(R, np.int64)
        ed = np.full(R, -1)
        gs = np.full(R, -1)
        ge = np.full(R, -1)
        hit = np.zeros(R, bool)

    # ---- subread slice (stored coords) ----------------------------------
    sub = spec.subread
    sa = s_qstart if sub.start_anchor == "qstart" else s_qend
    ea = s_qstart if sub.end_anchor == "qstart" else s_qend
    sub_strt = sa + sub.start_ofs
    if spec.name == "5p10XTCR":
        # sub_strt = qend-60 only when qlen > 60 (utils.py:245-248)
        sub_strt = np.where(qlen > -sub.start_ofs, sub_strt, s_qstart)
    if sub.start_clamp0:
        sub_strt = np.maximum(sub_strt, 0)
    sub_end = ea + sub.end_ofs
    if sub.end_clamp_len:
        sub_end = np.minimum(sub_end, rlen)
    sub_len = np.maximum(sub_end - sub_strt, 0)

    accept_sub = sub_len > sub.min_len if sub.min_len else np.ones(R, bool)
    if spec.subread_requires == "clip40":       # RTX, utils.py:78,83
        accept_sub &= (sub_end - s_qend) > 40
    elif spec.subread_requires == "span400":    # slideseq, utils.py:405-407,429
        accept_sub &= (rec.tend - rec.tstart) > 400
    elif spec.subread_requires == "qlen100":    # 3p10XTCR, utils.py:350
        accept_sub &= qlen > 100
    if spec.requires_adapter_for_subread:
        accept_sub &= hit
    if spec.name == "3p10XTCR":
        accept_sub &= hit                       # dist<6 gates both outputs

    # ---- bcumi candidate slices within the flank window ------------------
    bgs = np.where(hit, gs, 0).astype(np.int64)
    bge = np.where(hit, ge, 0).astype(np.int64)
    rule = spec.bcumi_rule
    if rule == "slice":
        b_lo, b_hi, do_rev, post = bgs, bge, False, 0
    elif rule == "rev_slice14":
        b_lo, b_hi, do_rev, post = bgs, bge, True, 14
    elif rule == "rev_slideseq":
        b_lo, b_hi, do_rev, post = np.maximum(bgs - 22, 0), bge + 16, True, 0
    elif rule == "rev_nuc":
        b_lo, b_hi, do_rev, post = bgs - 35, bge - 12, True, 0
        bad = bgs < 35                           # python wrap → reject
        b_lo = np.where(bad, 0, b_lo)
        b_hi = np.where(bad, 0, b_hi)
    elif rule == "rev_3pgex":
        b_lo, b_hi, do_rev, post = bgs - 32, bgs + 3, True, 0
        bad = bgs < 32
        b_lo = np.where(bad, 0, b_lo)
        b_hi = np.where(bad, 0, b_hi)
    else:
        b_lo = b_hi = np.zeros(R, np.int64)
        do_rev, post = False, 0
    b_hi = np.minimum(b_hi, wlen)
    b_lo = np.clip(b_lo, 0, None)
    b_len = np.maximum(b_hi - b_lo, 0)

    accept_bc = hit.copy()
    # in all 3' modes the adapter scan runs INSIDE the subread-accept block
    # (utils.py:429-454,350-357,1039-1083,1353-1383), so no subread ⇒ no
    # BC-UMI; 5' modes emit them independently (5p10XTCR writes every
    # subread but BC-UMI only on adapter hit)
    if spec.name in ("3pXCR_slideseq", "3p10XTCR", "3p10XTCR_nuc", "3p10XGEX"):
        accept_bc &= accept_sub
    # 3p10XGEX counts raw barcodes for the data-driven whitelist on every
    # adapter hit, before the length filter (utils.py:1374-1383)
    raw_count_rows = np.where(accept_bc)[0] if spec.name == "3p10XGEX" else []
    if spec.bcumi_min_len:
        accept_bc &= (b_len - post) > spec.bcumi_min_len

    # slideseq extra plumbing: polyA + post filter (utils.py:443-474)
    polyA_rows = []
    slideseq_pre_rows = np.zeros(0, np.int64)
    if rule == "rev_slideseq":
        # _eds_names rows are every adapter hit BEFORE the post filter
        # (utils.py:451-461: c_eds/newnames append on hit; the length/polyA
        # filter only gates _BCUMI/_polyA emission)
        slideseq_pre_rows = np.where(accept_bc)[0]
        pa_hi = np.maximum(b_lo + 5, 0)          # dd[:upstart+5]
        select_len = b_len
        pa_len = np.minimum(pa_hi, wlen)
        # reference condition is `<70 or (>70 and frac)` — a polyA of
        # EXACTLY 70 is rejected unconditionally (utils.py:468-474)
        acc = (select_len > 45) & \
            ((pa_len < 70) | ((pa_len > 70) & _a_frac_ok(window, pa_len)))
        accept_bc &= acc

    # ---- host assembly ----------------------------------------------------
    # one vectorized code→ASCII pass for the whole batch (and a bytes
    # revcomp table); per-row work is then pure bytes slicing — no
    # per-row numpy decode/copy (round-4 VERDICT #9 vectorization)
    ascii_rows = _CODE_TO_ASCII[codes.astype(np.uint8) % 6]
    _rc_bytes_cache: dict = {}

    def _row_bytes(i: int, rev: bool) -> bytes:
        if not rev:
            return ascii_rows[i].tobytes()
        b = _rc_bytes_cache.get(i)
        if b is None:
            n = int(codes.shape[1])
            b = ascii_rows[i, :n].tobytes().translate(_RC_TABLE)[::-1]
            _rc_bytes_cache[i] = b
        return b

    def stored_seq_slice(r, lo_, hi_):
        i = read_idx[r]
        n = int(rlen[r])
        lo_, hi_ = int(max(lo_, 0)), int(min(hi_, n))
        if hi_ <= lo_:
            return ""
        if strand[r] == 1:
            # stored orientation = revcomp of the padded row; the row's
            # revcomp places base n-1 at padded offset L-n
            L = int(codes.shape[1])
            off = L - n
            return _row_bytes(i, True)[off + lo_:off + hi_].decode("ascii")
        return _row_bytes(i, False)[lo_:hi_].decode("ascii")

    def stored_qual_slice(r, lo_, hi_):
        i = read_idx[r]
        n = int(rlen[r])
        lo_, hi_ = int(max(lo_, 0)), int(min(hi_, n))
        if hi_ <= lo_:
            return ""
        qv = quals[i][:n]
        if strand[r] == 1:
            return qv[::-1][lo_:hi_].decode("ascii")
        return qv[lo_:hi_].decode("ascii")

    def fmt_name(r):
        i = read_idx[r]
        trans = ref_names[rec.ref_id[r]]
        if spec.name == "RTX":
            trans = trans.split("|")[0]                     # utils.py:61
        elif spec.name in ("3p10XTCR", "3p10XTCR_nuc"):
            trans = trans.split("-")[0]                     # utils.py:324,1005
        flag = int(rec.flag[r])
        if spec.name_format.startswith("{rname10}"):        # 3p10XTCR
            return (f"{names[i][-10:]}_q{int(qlen[r])}_d{int(ed[r])}"
                    f"_s{int(sub_strt[r])}_e{int(sub_end[r])}_f{flag}_{trans}")
        if "{sample}" in spec.name_format:                  # slideseq / nuc
            return (f"{names[i]}_{sample}_{int(sub_strt[r])}"
                    f"_{int(sub_end[r])}_{flag}_{trans}")
        # default: original-orientation coords (qstrt_mod/qend_mod)
        return (f"{names[i]}_{int(qstart[r])}_{int(qend[r])}_{flag}_{trans}")

    sub_rows = np.where(accept_sub)[0]
    sub_names, sub_seqs, sub_quals = [], [], []
    for r in sub_rows:
        sub_names.append(fmt_name(r))
        sub_seqs.append(stored_seq_slice(r, sub_strt[r], sub_end[r]))
        sub_quals.append(stored_qual_slice(r, sub_strt[r], sub_end[r]))

    ascii_win = (_CODE_TO_ASCII[window.astype(np.uint8) % 6]
                 if window.size else np.zeros((R, 0), np.uint8))

    def bcumi_str(r):
        w = ascii_win[r, int(b_lo[r]):int(b_hi[r])].tobytes()
        if do_rev:
            w = w.translate(_RC_TABLE)[::-1]
        s = w.decode("ascii")
        return s[post:] if post else s

    raw_counts: dict = {}
    raw_rows: list = []
    for r in raw_count_rows:
        key = bcumi_str(r)[3:3 + 16]                        # utils.py:1376
        raw_counts[key] = raw_counts.get(key, 0) + 1
        raw_rows.append((int(r), key))

    bc_rows = np.where(accept_bc)[0]
    bc_names, bc_seqs = [], []
    for r in bc_rows:
        s = bcumi_str(r)
        bc_names.append(fmt_name(r))
        bc_seqs.append(s)
        if rule == "rev_slideseq":
            pa_hi = int(min(b_lo[r] + 5, wlen[r]))
            polyA_rows.append(
                (bc_names[-1],
                 ascii_win[r, :pa_hi].tobytes().decode("ascii")))

    # eds stats rows (mode-specific, SURVEY.md §5 observability).
    # 5p10XGEX computes no eds artifact — the reference's decon_5p10XGEX
    # writes only _deconcat/_BCUMI (utils.py:173-176).
    eds_rows = []
    eds_rec = np.zeros(0, np.int64)
    if spec.name == "5p10XTCR":
        lclip = -spec.flank.lo
        eds_rec = np.where(hit)[0]
        for r in eds_rec:
            start_corr = (lclip - gs[r]) if s_qstart[r] > lclip else (s_qstart[r] - gs[r])
            eds_rows.append([int(start_corr), ref_names[rec.ref_id[r]],
                             int(bge[r] - bgs[r]), int(ed[r])])
    elif spec.name == "3p10XTCR":
        eds_rows = [int(x) for x in ed]                     # every record
        eds_rec = np.arange(R)
    elif spec.name == "3pXCR_slideseq":
        # (name-with-'>' , editDistance) per pre-filter hit — the exact
        # rows the reference accumulates for _eds_names.csv
        # (newnamef carries the fasta '>' prefix, utils.py:426,459-461)
        eds_rec = slideseq_pre_rows
        eds_rows = [(">" + fmt_name(r), int(ed[r]))
                    for r in eds_rec]

    return DeconResult(sub_rows, sub_names, sub_seqs, sub_quals,
                       bc_rows, bc_names, bc_seqs, eds_rows, raw_counts,
                       polyA_rows, eds_rec, raw_rows)


def _a_frac_ok(window: np.ndarray, pa_len: np.ndarray) -> np.ndarray:
    """slideseq polyA filter: A fraction > 0.5 (utils.py:472-474)."""
    R, Wmax = window.shape
    out = np.zeros(R, bool)
    for r in range(R):
        n = int(pa_len[r])
        if n <= 0:
            continue
        out[r] = (window[r, :n] == 0).sum() / n > 0.5
    return out
