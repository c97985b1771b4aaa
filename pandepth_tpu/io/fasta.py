"""FASTA reading (kseq-equivalent) and reference-base tables.

The reference streams the ``-r`` fasta with kseq (include/kseq.h) and
stores sequences keyed by tid via ``Chr2IntMap[name]`` — note that C++
``map::operator[]`` *inserts 0* for unknown names and ``RefBase.insert``
never overwrites, so a non-header contig appearing before the real
tid-0 contig shadows it (src/PanDepth.cpp:3513-3527). Replicated
faithfully in ``load_ref_bases``.
"""

from __future__ import annotations

import gzip
from typing import Dict, Iterator, List, Tuple


def iter_fasta(path: str) -> Iterator[Tuple[str, bytes]]:
    """Yield (name, sequence) pairs; name is the first whitespace token
    after '>' (kseq semantics)."""
    opener = gzip.open if _is_gz(path) else open
    name = None
    seq: List[bytes] = []
    with opener(path, "rb") as fh:
        for raw in fh:
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">"):
                if name is not None:
                    yield name, b"".join(seq)
                name = line[1:].split()[0].decode() if len(line) > 1 else ""
                seq = []
            elif name is not None:
                seq.append(line)
    if name is not None:
        yield name, b"".join(seq)


def _is_gz(path: str) -> bool:
    with open(path, "rb") as fh:
        return fh.read(2) == b"\x1f\x8b"


def load_ref_bases(path: str, chr2tid: Dict[str, int]) -> Dict[int, bytes]:
    """tid -> sequence, with the reference's insert-only / default-0
    lookup quirks (src/PanDepth.cpp:3513-3527)."""
    out: Dict[int, bytes] = {}
    lookup = dict(chr2tid)
    for name, seq in iter_fasta(path):
        tid = lookup.setdefault(name, 0)
        out.setdefault(tid, seq)
    return out


def gc_count_ranges(seq: bytes, starts, ends) -> "np.ndarray":
    """GC base counts over 1-based inclusive [start, end] ranges, via a
    prefix-sum over a G/C indicator (counts G,g,C,c only — N and friends
    count 0 but still occupy length, src/PanDepth.cpp:947-949)."""
    import numpy as np

    arr = np.frombuffer(seq, np.uint8)
    is_gc = ((arr == ord("G")) | (arr == ord("g")) |
             (arr == ord("C")) | (arr == ord("c")))
    pref = np.concatenate(([0], np.cumsum(is_gc, dtype=np.int64)))
    s = np.clip(np.asarray(starts, np.int64) - 1, 0, len(seq))
    e = np.clip(np.asarray(ends, np.int64), 0, len(seq))
    e = np.maximum(e, s)
    return pref[e] - pref[s]
