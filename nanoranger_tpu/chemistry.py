"""ChemistrySpec: one declarative table for every per-mode constant.

The reference hardcodes each chemistry's motifs / clip windows / pad widths /
thresholds inside seven near-duplicate code paths (reference pipeline.py:154-834
and utils.py decon_* / write_bc_* / process_matching_*).  Here every
load-bearing constant (SURVEY.md §3.5) lives in one frozen spec so a single
jitted engine can serve all modes.

Citations point into /root/reference for parity checking.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

TRUSEQ = "AGATCGGAAGAGCGTCGTGT"          # reference utils.py:309,991,1296
SLIDESEQ_LINKER = "TCTTCAGCGTTCCCGAGA"    # reference utils.py:14


def _revcomp_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(s))


@dataclasses.dataclass(frozen=True)
class FlankSpec:
    """Where the BC-UMI adapter search window sits relative to the aligned span.

    window = seq[clamp(anchor+lo) : anchor+hi] with numpy-style clamping,
    where anchor is the query start ('qstart') or end ('qend') of the
    alignment (soft-clipped flank, reference README.md:17-22).
    """
    anchor: str          # 'qstart' | 'qend'
    lo: int              # offset of window start from anchor (may be negative)
    hi: int              # offset of window end from anchor
    # NOTE 5' modes clamp differently: seq[qstrt-lclip:qstrt+rclip] if
    # qstrt>lclip else seq[:qstrt+rclip]  (reference utils.py:129-132).
    # That is exactly max(0, anchor+lo) for lo<0, so one rule covers both.


@dataclasses.dataclass(frozen=True)
class AdapterScan:
    """Bounded edit-distance adapter search over the flank window.

    Replicates edlib.align(pattern, window, 'HW', 'locations', k[, ad_seq]).
    """
    pattern: str                 # motif; 'N' positions are wildcards iff n_wildcard
    k: int                       # edlib k cutoff
    max_ed_exclusive: int        # accept hit iff 0 <= ed < this
    n_wildcard: bool             # ad_seq N-equivalences passed? (utils.py:15)
    pick_last: bool              # locations[-1] (5' modes) vs locations[0] (3')
    window_size: int | None = None   # sliding sub-window width (None = whole flank)
    window_stride: int | None = None
    windows_plus_one: bool = False   # range(n//step + 1) vs range(n//step)
    # slideseq: w=dd[20i:20i+40], range(len//20)       (utils.py:435-437)
    # 3pGEX/nuc: w=end_qu[200i:200(i+1)+70], range(len//200+1) (utils.py:1045-1051,1360-1365)


@dataclasses.dataclass(frozen=True)
class SubreadSpec:
    """Transcript subread slice [start, end) relative to the aligned span.

    start = qstart + start_ofs, optionally clamped per mode's idiom;
    end    = qend + end_ofs (or qstart + end_ofs for 3' VDJ modes), clamped.
    """
    start_anchor: str    # 'qstart' | 'qend'
    start_ofs: int
    start_clamp0: bool   # clamp start to >= 0
    end_anchor: str      # 'qstart' | 'qend'
    end_ofs: int
    end_clamp_len: bool  # clamp end to <= read length
    min_len: int         # accept if len(sub) > min_len (0 = always)
    # extra predicates handled by engine flags below


@dataclasses.dataclass(frozen=True)
class BarcodeMatchSpec:
    """Whitelist construction + STAR-equivalent matching acceptance.

    pad: whitelist entry = N*pad_left + bc + N*pad_right
         (utils.py:615,584-595,1125,1451); slideseq inserts the 18nt linker
         between bc[:8] and bc[8:] (utils.py:595).
    as_min: accept alignment score >= as_min and unique best
            (utils.py:699,638,845,1150,1479; STAR outFilterMultimapScoreRange 0).
    umi_ref_offset: padded-reference column whose aligned query base starts
            the UMI (utils.py:708,646,856,1159,1490).
    """
    pad_left: int
    pad_right: int
    bc_len: int
    slideseq_linker: bool
    as_min: int
    umi_ref_offset: int
    umi_len: int
    # Nominal query offset of the barcode inside the extracted BC-UMI
    # candidate (derived from each mode's extraction slice layout; the
    # adapter scan anchors it, so seeding only needs ± jitter around this):
    #   5p10X*: candidate starts at the 14nt partial-R1 motif → bc at 14
    #   slideseq: rev(dd[start-22:end+16]) → 8 spare + bc8 at 8
    #   3p10XTCR: rev(match)[14:] → 6 truseq-rc + bc at 6 (utils.py:355)
    #   nuc: rev(end_qu[start-35:end-12]) → 7 truseq-rc + bc at 7 (utils.py:1068)
    #   3pGEX: rev(end_qu[start-32:start+3]) → 3 truseq-rc + bc at 3 (utils.py:1374)
    bc_query_offset: int = 14
    # Nominal query offset where the REVERSE-COMPLEMENT of the barcode
    # structure would sit inside the candidate (= typical candidate length
    # − bc_query_offset − structure length). STAR searches both strands
    # (scripts/barcode_align.sh); the engine's reverse pass screens the
    # candidate against revcomp'd whitelist tables around this offset.
    rc_query_offset: int = 20


@dataclasses.dataclass(frozen=True)
class ChemistrySpec:
    name: str
    flank: FlankSpec | None
    scan: AdapterScan | None
    subread: SubreadSpec
    barcode: BarcodeMatchSpec | None
    # BC-UMI candidate extraction relative to the adapter hit (start,end are
    # the edlib location pair *within the flank window*):
    #   'slice'      : window[start:end]                     (5' modes, utils.py:139,276)
    #   'rev_slice14': revcomp(window[start:end])[14:]       (3p10XTCR, utils.py:355)
    #   'rev_slideseq': revcomp(window[max(0,start-22):end+16]) (utils.py:443-448)
    #   'rev_nuc'    : revcomp(window[start-35:end-12])      (utils.py:1068)
    #   'rev_3pgex'  : revcomp(window[start-32:start+3])     (utils.py:1374)
    bcumi_rule: str | None
    bcumi_min_len: int            # keep if len(bcumi) > this (0 = always)
    requires_adapter_for_subread: bool  # 5p10XGEX writes subread only on hit
    subread_requires: str | None  # extra predicate: None|'span400'|'qlen100'
    name_format: str              # read-name metadata encoding
    # modes where ALL subreads go to deconcat regardless of adapter (5p10XTCR)
    notes: str = ""


_REGISTRY: dict[str, ChemistrySpec] = {}


def register(spec: ChemistrySpec) -> ChemistrySpec:
    _REGISTRY[spec.name] = spec
    return spec


def get(name: str) -> ChemistrySpec:
    return _REGISTRY[name]


def names() -> list[str]:
    return sorted(_REGISTRY)


# ---------------------------------------------------------------------------
# 5p10XGEX — flagship genotyping path (reference utils.py:97-176)
register(ChemistrySpec(
    name="5p10XGEX",
    flank=FlankSpec("qstart", -80, +20),                      # utils.py:102-103,129-132
    scan=AdapterScan("CGCTCTTCCGATCT" + "N" * 26 + "TTTCTTATATG",  # utils.py:105
                     k=6, max_ed_exclusive=7, n_wildcard=True, pick_last=True),
    subread=SubreadSpec("qstart", 0, False, "qend", 0, False, min_len=0),  # utils.py:146-148
    barcode=BarcodeMatchSpec(30, 40, 16, False, as_min=14,
                             umi_ref_offset=46, umi_len=10, bc_query_offset=14,
                             rc_query_offset=20),  # utils.py:615,699,708; rc: 50-14-16
    bcumi_rule="slice", bcumi_min_len=0,
    requires_adapter_for_subread=True,                        # utils.py:136-165
    subread_requires=None,
    name_format="{qname}_{qstrt_mod}_{qend_mod}_{flag}_{trans}",  # utils.py:161
))

# 5p10XTCR — 10x 5' TCR/BCR clonotypes, GEMX 28N motif (utils.py:179-299)
register(ChemistrySpec(
    name="5p10XTCR",
    flank=FlankSpec("qstart", -200, +20),                     # utils.py:182-183
    scan=AdapterScan("CGCTCTTCCGATCT" + "N" * 28 + "TTTCTTATATG",  # utils.py:202
                     k=6, max_ed_exclusive=7, n_wildcard=True, pick_last=True),
    # sub_strt = qend-60 (if qlen>60 else qstart), sub_end = qend+80 clamped
    subread=SubreadSpec("qend", -60, False, "qend", +80, True, min_len=0),  # utils.py:245-253
    barcode=BarcodeMatchSpec(30, 40, 16, False, as_min=14,
                             umi_ref_offset=46, umi_len=12, bc_query_offset=14,
                             rc_query_offset=22),  # utils.py:845,856; rc: 52-14-16
    bcumi_rule="slice", bcumi_min_len=0,
    requires_adapter_for_subread=False,                       # all subreads written, utils.py:266-269
    subread_requires=None,
    name_format="{qname}_{qstrt_mod}_{qend_mod}_{flag}_{trans}",  # utils.py:265
))

# RTX — subread extraction only, no barcodes (utils.py:44-94)
register(ChemistrySpec(
    name="RTX",
    flank=None, scan=None,
    # sub = seq[qstart : qend+100 clamped]; accept len>100 and clip>40
    subread=SubreadSpec("qstart", 0, False, "qend", +100, True, min_len=100),  # utils.py:70-83
    barcode=None,
    bcumi_rule=None, bcumi_min_len=0,
    requires_adapter_for_subread=False,
    subread_requires="clip40",                                # utils.py:78,83
    name_format="{qname}_{qstrt_mod}_{qend_mod}_{flag}_{trans}",  # utils.py:82
    notes="trans = reference_name.split('|')[0] (utils.py:61)",
))

# 3pXCR_slideseq — spatial TCR/BCR (utils.py:371-486)
register(ChemistrySpec(
    name="3pXCR_slideseq",
    flank=FlankSpec("qend", 0, +200),                         # utils.py:389,410-413
    scan=AdapterScan(_revcomp_str(SLIDESEQ_LINKER),           # utils.py:382
                     k=2, max_ed_exclusive=4, n_wildcard=False, pick_last=False,
                     window_size=40, window_stride=20, windows_plus_one=False),  # utils.py:435-437
    # VDJ subread: [max(0,qstart-200) : qstart+80]; accept len>100 & span>400
    subread=SubreadSpec("qstart", -200, True, "qstart", +80, False, min_len=100),  # utils.py:415-419,429
    barcode=BarcodeMatchSpec(15, 24, 14, True, as_min=30,
                             umi_ref_offset=47, umi_len=9, bc_query_offset=8,
                             rc_query_offset=16),   # utils.py:584-595,638,646-649; rc: 56-8-32
    bcumi_rule="rev_slideseq", bcumi_min_len=0,               # utils.py:443-448; post filter separate
    requires_adapter_for_subread=False,
    subread_requires="span400",                               # utils.py:405-407
    name_format="{qname}_{sample}_{sub_strt}_{sub_end}_{flag}_{trans}",  # utils.py:426,430
    notes="post filter: len(bcumi)>45 and (len(polyA)<70 or A_frac>0.5), utils.py:468-474",
))

# 3p10XTCR — 3' TCR with 10x barcodes matched slideseq-style (utils.py:302-368)
register(ChemistrySpec(
    name="3p10XTCR",
    flank=FlankSpec("qend", 0, +150),                         # utils.py:312,331-334
    scan=AdapterScan("A" * 6 + "N" * 28 + TRUSEQ,             # utils.py:309
                     k=5, max_ed_exclusive=6, n_wildcard=True, pick_last=False),
    # sub = [max(0,qstart-350) : qstart+100]; accept dist<6 & len>100 & qlen>100
    subread=SubreadSpec("qstart", -350, True, "qstart", +100, False, min_len=100),  # utils.py:336-342
    barcode=BarcodeMatchSpec(15, 24, 14, True, as_min=30,
                             umi_ref_offset=47, umi_len=9, bc_query_offset=6,
                             rc_query_offset=1),   # pipeline.py:623, utils.py:638-649; rc: 39-6-32
    bcumi_rule="rev_slice14", bcumi_min_len=0,                # utils.py:355
    requires_adapter_for_subread=True,                        # utils.py:350-357
    subread_requires="qlen100",
    name_format="{rname10}_q{qlen}_d{dist}_s{sub_strt}_e{sub_end}_f{flag}_{trans}",  # utils.py:348
    notes="trans = reference_name.split('-')[0] (utils.py:324)",
))

# 3p10XTCR_nuc — single-nucleus 3' TCR (utils.py:982-1113)
register(ChemistrySpec(
    name="3p10XTCR_nuc",
    flank=FlankSpec("qend", 0, +2000),                        # utils.py:993,1012-1015
    scan=AdapterScan(TRUSEQ,                                  # utils.py:991
                     k=2, max_ed_exclusive=3, n_wildcard=False, pick_last=False,
                     window_size=270, window_stride=200, windows_plus_one=True),  # utils.py:1045-1049
    # sub = [qstart : qend+100 clamped]; accept len>100
    subread=SubreadSpec("qstart", 0, False, "qend", +100, True, min_len=100),  # utils.py:1020-1029,1039
    barcode=BarcodeMatchSpec(16, 28, 16, False, as_min=14,
                             umi_ref_offset=32, umi_len=12, bc_query_offset=7,
                             rc_query_offset=20),  # utils.py:1125-1127,1150,1159; rc: 43-7-16
    bcumi_rule="rev_nuc", bcumi_min_len=30,                   # utils.py:1068,1077
    requires_adapter_for_subread=False,
    subread_requires=None,
    name_format="{qname}_{sample}_{sub_strt}_{sub_end}_{flag}_{trans}",  # utils.py:1037
    notes="trans = reference_name.split('-')[0] (utils.py:1005); window hit "
          "coords offset by 200*i for BOTH start/end (utils.py:1058-1059)",
))

# 3p10XGEX — whole/panel transcriptome count matrix (utils.py:1283-1409)
register(ChemistrySpec(
    name="3p10XGEX",
    flank=FlankSpec("qend", -70, +700),                       # utils.py:1297,1321-1324
    scan=AdapterScan(TRUSEQ,                                  # utils.py:1296
                     k=3, max_ed_exclusive=4, n_wildcard=False, pick_last=False,
                     window_size=270, window_stride=200, windows_plus_one=True),  # utils.py:1359-1365
    # sub = [max(0,qstart-1) : qend+1 clamped]; accept len>50
    subread=SubreadSpec("qstart", -1, True, "qend", +1, True, min_len=50),  # utils.py:1331-1341,1353
    barcode=BarcodeMatchSpec(4, 17, 16, False, as_min=14,
                             umi_ref_offset=20, umi_len=12, bc_query_offset=3,
                             rc_query_offset=16),  # utils.py:1451-1453,1479,1490-1497; rc: 35-3-16
    bcumi_rule="rev_3pgex", bcumi_min_len=30,                 # utils.py:1374,1378
    requires_adapter_for_subread=False,
    subread_requires=None,
    name_format="{qname}_{qstrt_mod}_{qend_mod}_{flag}_{trans}",  # utils.py:1351
    notes="raw-bc counting: bcumi[3:19] counted toward data-driven whitelist "
          "(utils.py:1376); whitelist = counts>20 ∩ 3M list (utils.py:1439-1447)",
))
