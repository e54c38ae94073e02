"""Real-scale sharded whitelist run (round-4 VERDICT #7).

Shards the FULL 737,280-barcode whitelist over the 'wl' axis of a
(data x wl) virtual device mesh, matches every BC-UMI candidate of a
real reference sample (TCR3 by default), and asserts bit-equality of
(bc, score, status, umi) with the single-device exact matcher — the
"TP-like" sharded-argmax story of SURVEY.md §2.3 demonstrated at the
scale where sharding matters, not a 300-barcode toy.

Run (CPU virtual mesh, same config the driver's dryrun uses):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/sharded_run.py [--n-reads 1200] [--data 2] [--wl 4]
Writes docs/SHARDED_RUN.json (wall, peak RSS, counts).
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sample", default="TCR3")
    ap.add_argument("--mode", default="5p10XTCR")
    ap.add_argument("--trns", default="TR_V_human.fa")
    ap.add_argument("--n-reads", type=int, default=1200)
    ap.add_argument("--data", type=int, default=1)
    ap.add_argument("--dp-chunk", type=int, default=64,
                    help="DP rows per while_loop chunk; small values keep "
                         "the gap between in-loop collectives under the "
                         "XLA CPU 40 s rendezvous watchdog on "
                         "oversubscribed hosts")
    ap.add_argument("--wl", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "SHARDED_RUN.json"))
    a = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= a.data * a.wl, \
        f"need {a.data * a.wl} devices (set XLA_FLAGS)"

    from nanoranger_tpu import chemistry
    from nanoranger_tpu.io.encode import encode_batch
    from nanoranger_tpu.io.whitelist import load as load_wl
    from nanoranger_tpu.parallel.sharded import (ShardedWhitelist,
                                                 build_sharded_match,
                                                 make_mesh)
    from nanoranger_tpu.stages.barcode import BarcodeMatcher
    from tools.match_parity import candidates_for

    spec = chemistry.get(a.mode)
    bcs = load_wl(os.path.join(REPO, "data", "737K-august-2016.txt.gz"))
    print(f"[sharded-run] whitelist {len(bcs)} barcodes over "
          f"{a.data}x{a.wl} (data x wl) mesh", flush=True)
    names, seqs = candidates_for(a.sample, a.mode, a.trns, a.n_reads)
    n = len(seqs)
    print(f"[sharded-run] {n} candidates from {a.sample} "
          f"({a.n_reads}-read prefix)", flush=True)
    Lq = 96
    q, qlen = encode_batch(seqs, max_len=Lq)

    # single-device exact reference (host path, native DP)
    t0 = time.time()
    m = BarcodeMatcher(bcs, spec.barcode)
    ref = m._match_host(q, np.asarray(qlen, np.int32))
    t_single = time.time() - t0
    print(f"[sharded-run] single-device: {t_single:.1f}s, "
          f"accepted {int((ref['status'] == 0).sum())}/{n}", flush=True)

    # sharded run over the mesh
    t0 = time.time()
    mesh = make_mesh(a.data, a.wl)
    swl = ShardedWhitelist(bcs, spec.barcode, a.wl, dp_chunk=a.dp_chunk)
    arrs = swl.device_arrays(mesh)
    fn = build_sharded_match(swl, mesh)
    batch = 256
    got = {k: [] for k in ("bc_idx", "score", "status", "umi")}
    for s in range(0, n, batch):
        qc = q[s:s + batch]
        qlc = qlen[s:s + batch]
        nb = qc.shape[0]
        pad = -(-nb // a.data) * a.data - nb
        if pad or nb < batch:
            qc = np.pad(qc, ((0, batch - nb), (0, 0)))
            qlc = np.pad(qlc, (0, batch - nb))
        bc, score, status, umi, _ = fn(qc, qlc, arrs)
        got["bc_idx"].append(np.asarray(bc)[:nb])
        got["score"].append(np.asarray(score)[:nb])
        got["status"].append(np.asarray(status)[:nb])
        got["umi"].append(np.asarray(umi)[:nb])
        print(f"[sharded-run]   batch {s // batch}: "
              f"{min(s + batch, n)}/{n} ({time.time() - t0:.0f}s)",
              flush=True)
    got = {k: np.concatenate(v) for k, v in got.items()}
    t_sharded = time.time() - t0

    mismatch = {}
    for k in ("bc_idx", "score", "status", "umi"):
        bad = int((got[k] != ref[k]).sum())
        if bad:
            mismatch[k] = bad
    assert not mismatch, f"sharded != single-device: {mismatch}"
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    rep = {
        "sample": a.sample, "mode": a.mode, "n_reads": a.n_reads,
        "n_candidates": n, "n_whitelist": int(len(bcs)),
        "mesh": {"data": a.data, "wl": a.wl},
        "per_shard_rows": swl.per_shard,
        "accepted": int((got["status"] == 0).sum()),
        "equal_to_single_device": True,
        "wall_s_single": round(t_single, 1),
        "wall_s_sharded": round(t_sharded, 1),
        "peak_rss_mb": round(peak_rss_mb, 1),
        "note": ("virtual 8-device CPU mesh; the sharded DP tail runs "
                 "the XLA-scan fallback per shard (the native/pallas "
                 "kernels are per-backend, not shard_map'd), so "
                 "wall_s_sharded is a correctness artifact, not a "
                 "speed claim"),
    }
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(rep, f, indent=1)
    print(f"[sharded-run] OK — equal to single device; wrote {a.out}",
          flush=True)


if __name__ == "__main__":
    main()
