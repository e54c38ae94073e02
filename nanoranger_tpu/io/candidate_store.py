"""Spill-backed store for BC-UMI candidate (name, seq) pairs.

The streamed CLI accumulates one candidate per recovered subread flank.
At reference-sample scale (~4-20k reads) a Python list is fine; at the
production regime the engine targets (10^8 reads — round-4 VERDICT
weak #8) two lists of ~60-100-char Python strings are tens of GB of
host heap. The reference never hits this because each seqkit shard is a
separate process whose lists die with it (reference pipeline.py:76-151);
this engine streams one process, so the store bounds the resident set
instead: candidates buffer in memory up to `chunk` pairs, then spill to
a pickle under a private tmpdir, and downstream stages consume them by
sequential iteration (`iter_batches` for the matcher, `rows` for the
prematched-pending tail, `head`/`tail` for the resume fingerprint) —
peak RSS during the streaming phase is O(chunk), independent of read
count (tests/test_scale_paths.py).
"""

from __future__ import annotations

import os
import pickle
import shutil
import tempfile
import weakref
from typing import Iterable, Iterator


class CandidateStore:
    """Append-only (name, seq) store with bounded resident memory."""

    def __init__(self, chunk: int | None = None, tmpdir: str | None = None):
        if chunk is None:
            chunk = int(os.environ.get("NANORANGER_SPILL_CHUNK", 1 << 16))
        self.chunk = max(1, chunk)
        self._names: list = []
        self._seqs: list = []
        self._files: list = []        # (path, n_rows) per spilled chunk
        self._n = 0
        self._dir = None
        self._base_tmpdir = tmpdir
        self._finalizer = None

    @classmethod
    def from_lists(cls, names, seqs) -> "CandidateStore":
        """In-memory store over existing lists (tests / tiny runs):
        never spills, zero copies."""
        s = cls(chunk=max(1, len(names)) + 1)
        s._names = list(names)
        s._seqs = list(seqs)
        s._n = len(s._names)
        return s

    # -- append side ------------------------------------------------------
    def append(self, name: str, seq: str) -> None:
        self._names.append(name)
        self._seqs.append(seq)
        self._n += 1
        if len(self._names) >= self.chunk:
            self._spill()

    def extend(self, names: Iterable[str], seqs: Iterable[str]) -> None:
        for nm, sq in zip(names, seqs):
            self.append(nm, sq)

    def _spill(self) -> None:
        if self._dir is None:
            self._dir = tempfile.mkdtemp(prefix="nr_cands_",
                                         dir=self._base_tmpdir)
            self._finalizer = weakref.finalize(
                self, shutil.rmtree, self._dir, ignore_errors=True)
        path = os.path.join(self._dir, f"chunk_{len(self._files):06d}.pkl")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump((self._names, self._seqs), f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)
        self._files.append((path, len(self._names)))
        self._names, self._seqs = [], []

    # -- read side --------------------------------------------------------
    def __len__(self) -> int:
        return self._n

    @property
    def buffered(self) -> int:
        """Rows currently resident in memory (bounded by `chunk`)."""
        return len(self._names)

    @property
    def spilled_chunks(self) -> int:
        return len(self._files)

    def iter_chunks(self) -> Iterator[tuple[list, list]]:
        for path, _ in self._files:
            with open(path, "rb") as f:
                yield pickle.load(f)
        if self._names:
            yield self._names, self._seqs

    def iter_pairs(self) -> Iterator[tuple[str, str]]:
        for names, seqs in self.iter_chunks():
            yield from zip(names, seqs)

    def iter_batches(self, batch: int) -> Iterator[tuple[list, list]]:
        """Re-chunked sequential iteration: (names, seqs) lists of
        exactly `batch` rows (last one short)."""
        bn: list = []
        bs: list = []
        for names, seqs in self.iter_chunks():
            i = 0
            while i < len(names):
                take = min(batch - len(bn), len(names) - i)
                bn.extend(names[i:i + take])
                bs.extend(seqs[i:i + take])
                i += take
                if len(bn) == batch:
                    yield bn, bs
                    bn, bs = [], []
        if bn:
            yield bn, bs

    def rows(self, sorted_idx) -> Iterator[tuple[str, str]]:
        """(name, seq) for ascending global row indices, one sequential
        pass over the spilled chunks (no full materialization)."""
        it = iter(sorted_idx)
        want = next(it, None)
        base = 0
        for names, seqs in self.iter_chunks():
            hi = base + len(names)
            while want is not None and want < hi:
                if want < base:
                    raise ValueError("rows() requires ascending indices")
                yield names[want - base], seqs[want - base]
                want = next(it, None)
            base = hi
            if want is None:
                break
        if want is not None:
            raise IndexError(f"row {want} out of range ({self._n})")

    def head(self, k: int) -> list:
        out: list = []
        for names, _ in self.iter_chunks():
            out.extend(names[:k - len(out)])
            if len(out) >= k:
                break
        return out

    def tail(self, k: int) -> list:
        out: list = []
        # walk chunks from the end; only the last ceil(k/chunk) load
        chunks = [p for p, _ in self._files]
        tail_lists = [self._names] if self._names else []
        for path in reversed(chunks):
            if sum(len(t) for t in tail_lists) >= k:
                break
            with open(path, "rb") as f:
                tail_lists.insert(0, pickle.load(f)[0])
        for t in tail_lists:
            out.extend(t)
        return out[-k:]

    def names_list(self) -> list:
        """Materialize ALL names (one O(n) list — used to build the
        final per-candidate assignment table, which is itself O(n))."""
        out: list = []
        for names, _ in self.iter_chunks():
            out.extend(names)
        return out

    def close(self) -> None:
        if self._finalizer is not None:
            self._finalizer()
        self._files = []
