"""AOT executable cache: deterministic cold-start for the big fused
programs.

JAX's persistent compilation cache keys the serialized HLO, which for the
large fused programs here turns out to be process-dependent on the tunnel
backend (observed: identical call → different cache key per process), so
cold starts re-pay a 1-8 minute remote compile. This cache sidesteps the
HLO key entirely: we serialize the compiled executable
(jax.experimental.serialize_executable) under a digest WE define —
backend identity, jax version, input shapes/dtypes, the table bytes the
program embeds as constants (whitelist/index), and the source bytes of
the modules that build the computation (so any kernel edit invalidates).

Entries live in NANORANGER_AOT_CACHE (default <repo>/.aot_cache) and can
ship with a deployment: a production fleet compiles once and every other
host/process loads in seconds. Failures of any kind fall back to the
plain jitted function (the cache is an optimization only).
"""

from __future__ import annotations

import hashlib
import os
import pickle

_DEF_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".aot_cache")

# modules whose source participates in the digest (the compute path the
# cached executables embody)
_SRC_MODULES = (
    "nanoranger_tpu.stages.cli_step",
    "nanoranger_tpu.stages.device_step",
    "nanoranger_tpu.stages.barcode",
    "nanoranger_tpu.stages.decon",
    "nanoranger_tpu.align.aligner",
    "nanoranger_tpu.align.minimizers",
    "nanoranger_tpu.ops.pallas_chain",
    "nanoranger_tpu.ops.pallas_ed",
    "nanoranger_tpu.ops.pallas_sw",
    "nanoranger_tpu.ops.sw",
    "nanoranger_tpu.ops.whitelist_verify",
    "nanoranger_tpu.ops.mxu_lookup",
    "nanoranger_tpu.ops.extend",
    "nanoranger_tpu.ops.edit_distance",
)


def _source_digest() -> str:
    import importlib
    h = hashlib.sha1()
    for m in _SRC_MODULES:
        try:
            mod = importlib.import_module(m)
            with open(mod.__file__, "rb") as f:
                h.update(f.read())
        except Exception:
            h.update(m.encode())
    return h.hexdigest()


def cache_key(name: str, example_args, extra_parts=()) -> str:
    import jax
    import numpy as np
    h = hashlib.sha1()
    h.update(jax.__version__.encode())
    dev = jax.devices()[0]
    h.update(f"{dev.platform}:{getattr(dev, 'device_kind', '')}".encode())
    for a in jax.tree.leaves(example_args):
        a = np.asarray(a)
        h.update(f"{a.shape}:{a.dtype}".encode())
    for p in extra_parts:
        if isinstance(p, np.ndarray):
            h.update(p.tobytes())
        else:
            h.update(repr(p).encode())
    h.update(_source_digest().encode())
    return f"{name}-{h.hexdigest()}"


def get_or_compile(name: str, jitted, example_args, extra_parts=(),
                   cache_dir: str | None = None, log=None):
    """Return a callable: the deserialized cached executable if present,
    else compile `jitted` on example_args, persist, and return it. On any
    failure returns `jitted` unchanged."""
    import jax

    if jax.default_backend() == "cpu":
        return jitted                  # CPU compiles are cheap; skip
    cache_dir = cache_dir or os.environ.get("NANORANGER_AOT_CACHE",
                                            _DEF_DIR)
    try:
        from jax.experimental import serialize_executable as se
    except Exception:
        return jitted
    key = cache_key(name, example_args, extra_parts)
    path = os.path.join(cache_dir, key + ".bin")
    if os.path.isfile(path):
        # watchdog: deserialization moves a multi-hundred-MB executable
        # through the backend transport, which has been observed to hang
        # on tunnel backends. Run it on a daemon thread with a deadline;
        # on timeout fall back to the plain jit path (the stuck thread
        # never joins — daemon=True lets the process exit regardless).
        import threading
        deadline = float(os.environ.get("NANORANGER_AOT_TIMEOUT", "180"))
        box: dict = {}

        def _load():
            try:
                with open(path, "rb") as f:
                    blob, in_tree, out_tree = pickle.load(f)
                box["ok"] = se.deserialize_and_load(blob, in_tree, out_tree)
            except Exception as e:          # stale/incompatible blob
                box["err"] = e

        th = threading.Thread(target=_load, daemon=True)
        th.start()
        th.join(deadline)
        if "ok" in box:
            if log:
                log(f"aot: loaded {name} executable "
                    f"({os.path.getsize(path) >> 20} MB)")
            return box["ok"]
        if th.is_alive():
            if log:
                log(f"aot: load exceeded {deadline:.0f}s deadline; "
                    "using jit path (set NANORANGER_AOT=0 to skip aot)")
            return jitted
        if log:
            log(f"aot: load failed ({box.get('err')!r}); recompiling")
    try:
        compiled = jitted.lower(*example_args).compile()
        payload = se.serialize(compiled)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
        if log:
            log(f"aot: compiled+cached {name} "
                f"({os.path.getsize(path) >> 20} MB)")
        return compiled
    except Exception as e:
        if log:
            log(f"aot: compile-path fallback ({e!r})")
        return jitted
