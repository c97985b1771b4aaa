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
import os
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


def iter_fasta_gc(path: str) -> Iterator[Tuple[str, PackedGC]]:
    """(name, PackedGC) per contig — native streaming scanner when the
    C++ library is available (one pass, no whole-contig byte buffers),
    Python iter_fasta otherwise."""
    try:
        import ctypes

        from pandepth_tpu.io.native import load_library

        lib = load_library()
    except Exception:
        lib = None
    if lib is not None and os.environ.get("PANDEPTH_NO_NATIVE") != "1":
        import numpy as np

        err = ctypes.create_string_buffer(256)
        h = lib.pancov_fasta_gc_load(path.encode(), err, 256)
        if h:
            try:
                nbuf = ctypes.create_string_buffer(4096)
                for i in range(lib.pancov_fasta_gc_count(h)):
                    if lib.pancov_fasta_gc_name(h, i, nbuf, 4096) < 0:
                        raise ValueError("fasta contig name too long")
                    sz = lib.pancov_fasta_gc_packed_size(h, i)
                    packed = np.empty(sz, np.uint8)
                    if sz:
                        lib.pancov_fasta_gc_copy(h, i, packed)
                    yield (nbuf.value.decode(),
                           PackedGC.from_packed(
                               packed, lib.pancov_fasta_gc_len(h, i)))
            finally:
                lib.pancov_fasta_gc_free(h)
            return
    for name, seq in iter_fasta(path):
        yield name, PackedGC(seq)


def load_ref_bases(path: str, chr2tid: Dict[str, int]
                   ) -> Dict[int, PackedGC]:
    """tid -> packed G/C indicator, with the reference's insert-only /
    default-0 lookup quirks (src/PanDepth.cpp:3513-3527).

    Contigs are packed as they stream (PackedGC): the raw bytes of a
    3 Gb reference would alone exhaust this host's fast-backed RSS
    budget (~3.5 GB; see PackedGC)."""
    out: Dict[int, PackedGC] = {}
    lookup = dict(chr2tid)
    for name, gc in iter_fasta_gc(path):
        tid = lookup.setdefault(name, 0)
        if tid not in out:
            out[tid] = gc
    return out


class PackedGC:
    """1-bit-per-base G/C indicator for one contig (bitorder little).

    A 3 Gb reference held as raw bytes costs 3 GB of RSS; this host's
    VMM backs guest memory fast only up to ~3.5-4 GB of process RSS
    (beyond that every fresh page faults at ~100 us, measured), so the
    raw-bytes representation starved everything after the load. The
    indicator is 8x smaller (31 MB per 250 Mb contig) and GC range
    counts come from popcounts over it."""

    __slots__ = ("packed", "n")

    def __init__(self, seq: bytes):
        import numpy as np

        arr = np.frombuffer(seq, np.uint8)
        self.n = arr.shape[0]
        low = arr | 0x20                  # ASCII upper -> lower
        is_gc = (low == ord("g")) | (low == ord("c"))
        self.packed = np.packbits(is_gc, bitorder="little")

    def __len__(self) -> int:
        return self.n

    @classmethod
    def from_packed(cls, packed, n: int) -> "PackedGC":
        obj = object.__new__(cls)
        obj.packed = packed
        obj.n = int(n)
        return obj

    def count_ranges(self, starts, ends) -> "np.ndarray":
        """GC counts over 1-based inclusive [start, end] ranges (same
        clipping semantics as gc_count_ranges on raw bytes)."""
        import numpy as np

        n = self.n
        s = np.clip(np.asarray(starts, np.int64) - 1, 0, n)
        e = np.clip(np.asarray(ends, np.int64), 0, n)
        e = np.maximum(e, s)
        if s.shape[0] == 0:
            return np.zeros(0, np.int64)
        packed = self.packed
        nb = packed.shape[0]
        if nb == 0:
            return np.zeros(s.shape[0], np.int64)
        bitcnt = np.bitwise_count(packed)
        bs = (s + 7) >> 3                 # first full byte
        be = e >> 3                       # end of full bytes
        idx = np.empty(2 * s.shape[0], np.int64)
        idx[0::2] = bs
        idx[1::2] = np.maximum(be, bs)
        pad = np.zeros(nb + 1, np.uint8)
        pad[:nb] = bitcnt
        full = np.add.reduceat(pad, np.minimum(idx, nb),
                               dtype=np.int64)[0::2]
        full[be <= bs] = 0
        # head: bits [s, min(e, 8*bs)) of byte s>>3, only when s
        # isn't byte-aligned (aligned starts have no partial head)
        hb = s >> 3
        a = s & 7                         # int64: 1 << 8 must not wrap
        b = np.minimum(a + (e - s), 8)
        hmask = (((1 << b) - 1) ^ ((1 << a) - 1)).astype(np.uint8)
        head = np.bitwise_count(
            packed[np.minimum(hb, nb - 1)] & hmask).astype(np.int64)
        head[a == 0] = 0
        # tail: bits [8*be, e) of byte be, when e isn't aligned and
        # the tail byte isn't already covered by the head
        tmask = ((1 << (e & 7)) - 1).astype(np.uint8)
        tail = np.bitwise_count(
            packed[np.minimum(be, nb - 1)] & tmask).astype(np.int64)
        tail[((e & 7) == 0) | (be < bs)] = 0
        return full + head + tail


def gc_count_ranges(seq, starts, ends) -> "np.ndarray":
    """GC base counts over 1-based inclusive [start, end] ranges
    (counts G,g,C,c only — N and friends count 0 but still occupy
    length, src/PanDepth.cpp:947-949). ``seq`` is raw bytes or a
    :class:`PackedGC`.

    One ``np.add.reduceat`` pass over an int8 indicator instead of an
    int64 prefix sum: the prefix materialized 8 bytes/base (2 GB per
    250 Mb contig — measured minutes of page-fault stalls per contig
    on a 3 Gb reference on this host); the indicator is 1 byte/base
    and the reduction allocates nothing per-base."""
    import numpy as np

    if isinstance(seq, PackedGC):
        return seq.count_ranges(starts, ends)
    arr = np.frombuffer(seq, np.uint8)
    n = arr.shape[0]
    s = np.clip(np.asarray(starts, np.int64) - 1, 0, n)
    e = np.clip(np.asarray(ends, np.int64), 0, n)
    e = np.maximum(e, s)
    if s.shape[0] == 0:
        return np.zeros(0, np.int64)
    low = arr | 0x20                      # ASCII upper -> lower
    ind = np.zeros(n + 1, np.int8)        # +1: index n is addressable
    np.logical_or(low == ord("g"), low == ord("c"), out=ind[:n].view(bool))
    idx = np.empty(2 * s.shape[0], np.int64)
    idx[0::2] = s
    idx[1::2] = e
    # reduceat pairs: [s_i, e_i) sums at even slots (odd slots are the
    # gaps, ignored); an empty range yields data[s_i], zeroed below
    out = np.add.reduceat(ind, idx, dtype=np.int64)[0::2]
    out[e == s] = 0
    return out
