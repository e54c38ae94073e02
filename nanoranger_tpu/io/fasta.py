"""Fasta IO for reference panels, whitelisted barcode 'reads', and BC-UMI
candidates (reference writes these via raw file appends, utils.py:167-168).
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterator

import numpy as np

from .encode import encode


def _open_text(path: str):
    if path.endswith(".gz"):
        return io.TextIOWrapper(
            io.BufferedReader(gzip.open(path, "rb"), buffer_size=1 << 20),
            encoding="ascii", errors="replace")
    return open(path, "rt", buffering=1 << 20)


def iter_fasta(path: str) -> Iterator[tuple[str, str]]:
    """Yield (full_header_sans_gt, sequence) pairs."""
    name = None
    chunks: list[str] = []
    with _open_text(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    yield name, "".join(chunks)
                name = line[1:]
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            yield name, "".join(chunks)


def read_fasta(path: str) -> tuple[list[str], list[str]]:
    names, seqs = [], []
    for n, s in iter_fasta(path):
        names.append(n)
        seqs.append(s.upper())
    return names, seqs


def read_fasta_encoded(path: str) -> tuple[list[str], list[np.ndarray]]:
    """Reference panels as int8 code arrays. The SAM reference name is the
    first whitespace token of the header (minimap2/pysam convention)."""
    names, seqs = read_fasta(path)
    names = [n.split()[0] for n in names]
    return names, [encode(s) for s in seqs]


class FastaWriter:
    """tmp+rename on close, so an existing artifact is always complete
    (safe resume-on-existence; see io/fastq.FastqWriter)."""

    def __init__(self, path: str):
        self.path = path
        self._tmp = path + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if path.endswith(".gz"):
            self._f = gzip.open(self._tmp, "wb", compresslevel=1)
        else:
            self._f = open(self._tmp, "wb")

    def write(self, name: str, seq: str | bytes):
        if isinstance(seq, str):
            seq = seq.encode("ascii")
        self._f.write(b">" + name.encode("ascii") + b"\n" + seq + b"\n")

    def close(self):
        self._f.close()
        os.replace(self._tmp, self.path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
