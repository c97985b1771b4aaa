"""BAM index (.bai / .csi) parsing and region queries.

Covers the role of htslib's ``sam_index_load`` + ``sam_itr_regarray``
(used by the reference's indexed workers, src/PanDepth.cpp:617-801):
given target regions, produce the merged virtual-offset chunk ranges
whose BGZF blocks are worth decompressing. On sparse targets this lets
the native loader skip most of the file.

Virtual offsets are ``(compressed_block_start << 16) | in_block_offset``
(SAMv1 §4.1.9); BAI uses a fixed 6-level binning over 2^29 spans
(§5.3), CSI generalizes with min_shift/depth.
"""

from __future__ import annotations

import gzip
import struct
from typing import List, Optional, Tuple

import numpy as np


class BamIndex:
    def __init__(self, n_ref: int, bins: List[dict],
                 linear: List[np.ndarray], min_shift: int = 14,
                 depth: int = 5):
        self.n_ref = n_ref
        self.bins = bins        # per ref: {bin: ndarray (n,2) chunks}
        self.linear = linear    # per ref: int64 16kb-window offsets
        self.min_shift = min_shift
        self.depth = depth
        self._raw = b""  # backing bytes for lazy bin payloads

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, path: str) -> "BamIndex":
        with open(path, "rb") as fh:
            magic = fh.read(2)
        raw = (gzip.open(path, "rb").read() if magic == b"\x1f\x8b"
               else open(path, "rb").read())
        if raw[:4] == b"BAI\x01":
            return cls._parse(raw, csi=False)
        if raw[:4] == b"CSI\x01":
            return cls._parse(raw, csi=True)
        raise ValueError(f"not a BAI/CSI index: {path}")

    @classmethod
    def _parse(cls, raw: bytes, csi: bool) -> "BamIndex":
        off = 4
        min_shift, depth = 14, 5
        if csi:
            min_shift, depth, laux = struct.unpack_from("<iii", raw, off)
            off += 12 + laux
        (n_ref,) = struct.unpack_from("<i", raw, off)
        off += 4
        bins: List[dict] = []
        linear: List[np.ndarray] = []
        # bin payloads parse LAZILY: a dense-coverage BAI holds
        # hundreds of thousands of bins and materializing an ndarray
        # per bin up front cost ~0.4 s on a 3 Gb / 8M-read index —
        # longer than the ranged decode it gates. The header scan
        # stores (byte_offset, n_chunk); bin_chunks() materializes
        # (and memoizes) only the bins a query actually touches.
        s_bai = struct.Struct("<Ii")
        s_csi = struct.Struct("<IQi")
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", raw, off)
            off += 4
            bmap = {}
            for _ in range(n_bin):
                if csi:
                    b, _loff, n_chunk = s_csi.unpack_from(raw, off)
                    off += 16
                else:
                    b, n_chunk = s_bai.unpack_from(raw, off)
                    off += 8
                bmap[b] = (off, n_chunk)
                off += 16 * n_chunk
            if csi:
                lin = np.zeros(0, np.int64)
            else:
                (n_intv,) = struct.unpack_from("<i", raw, off)
                off += 4
                lin = np.frombuffer(raw, "<u8", count=n_intv,
                                    offset=off).astype(np.int64)
                off += 8 * n_intv
            bins.append(bmap)
            linear.append(lin)
        idx = cls(n_ref, bins, linear, min_shift, depth)
        idx._raw = raw
        return idx

    def _u32view(self) -> np.ndarray:
        v = getattr(self, "_u32v", None)
        if v is None:
            v = np.frombuffer(self._raw, "<u4",
                              count=(len(self._raw) // 4))
            self._u32v = v
        return v

    def bulk_bin_chunks(self, tid: int, bin_ids) -> np.ndarray:
        """Concatenated (n, 2) int64 chunk ranges of MANY bins at once.

        Dense gene sets touch 1e5+ bins per contig; materializing each
        lazily costs ~1 us of frombuffer+astype a bin, so the lazy
        (offset, count) entries are gathered VECTORIZED off the raw
        index bytes instead: one fancy-indexed u32-pair gather for
        every u64 word of every requested payload (BAI layouts keep
        all payloads 4-byte aligned; an unaligned layout — possible
        for CSI via l_aux — falls back to the per-bin path). Rows come
        out GROUPED IN ``bin_ids`` ORDER even when lazy and already-
        materialized entries mix (bin_chunks silently mutates entries
        lazy → eager, so a stable contract keeps future callers safe;
        advisor r4): the lazy gather emits payloads in request order
        and each is spliced back into its slot."""
        bmap = self.bins[tid]
        offs: List[int] = []
        cnts: List[int] = []
        parts: List[Optional[np.ndarray]] = []  # None = lazy slot
        for b in bin_ids:
            v = bmap.get(b)
            if v is None:
                continue
            if isinstance(v, tuple):
                offs.append(v[0])
                cnts.append(v[1])
                parts.append(None)
            else:
                parts.append(v)
        if offs:
            offs_a = np.asarray(offs, np.int64)
            cnts_a = np.asarray(cnts, np.int64)
            words = 2 * cnts_a  # u64 words per payload
            tot = int(words.sum())
            if tot and not (offs_a & 3).any():
                base = np.repeat(offs_a >> 2, words)
                within = np.arange(tot, dtype=np.int64) - np.repeat(
                    np.cumsum(words) - words, words)
                lo = base + 2 * within
                v32 = self._u32view()
                vals = (v32[lo].astype(np.uint64)
                        | (v32[lo + 1].astype(np.uint64)
                           << np.uint64(32)))
                lazy_all = vals.astype(np.int64).reshape(-1, 2)
            elif tot:
                # unaligned (CSI l_aux): per-bin frombuffer fallback
                lazy_all = np.concatenate([
                    np.frombuffer(self._raw, "<u8", count=2 * n,
                                  offset=o).reshape(-1, 2)
                    .astype(np.int64)
                    for o, n in zip(offs, cnts)])
            else:
                lazy_all = np.zeros((0, 2), np.int64)
            # splice each lazy payload back into its bin_ids slot
            ends = np.cumsum(cnts_a)
            k = 0
            for i, p in enumerate(parts):
                if p is None:
                    parts[i] = lazy_all[int(ends[k]) - int(cnts_a[k]):
                                        int(ends[k])]
                    k += 1
        out = [p for p in parts if len(p)]
        if not out:
            return np.zeros((0, 2), np.int64)
        return np.concatenate(out) if len(out) > 1 else out[0]

    def bin_chunks(self, tid: int, b: int) -> Optional[np.ndarray]:
        """This bin's (n, 2) int64 chunk ranges, or None; materializes
        the lazy (offset, count) parse entry on first touch."""
        v = self.bins[tid].get(b)
        if v is None:
            return None
        if isinstance(v, tuple):
            o, n = v
            v = np.frombuffer(self._raw, "<u8", count=2 * n,
                              offset=o).reshape(-1, 2).astype(np.int64)
            self.bins[tid][b] = v
        return v

    # ------------------------------------------------------------------
    def _reg2bins(self, beg: int, end: int) -> List[int]:
        """All bins overlapping 0-based half-open [beg, end)."""
        out = []
        end -= 1
        if self.min_shift == 14 and self.depth == 5:
            out.append(0)
            for shift, base in ((26, 1), (23, 9), (20, 73), (17, 585),
                                (14, 4681)):
                out.extend(range(base + (beg >> shift),
                                 base + (end >> shift) + 1))
            return out
        # CSI generalized scheme
        l_, t_, s_ = 0, 0, self.min_shift + 3 * self.depth
        while l_ <= self.depth:
            b = t_ + (beg >> s_)
            e = t_ + (end >> s_)
            out.extend(range(b, e + 1))
            s_ -= 3
            t_ += 1 << (3 * l_)
            l_ += 1
        return out

    def query(self, tid: int, beg: int, end: int) -> np.ndarray:
        """Merged (v0, v1) chunk ranges for reads overlapping
        0-based half-open [beg, end)."""
        if tid < 0 or tid >= self.n_ref or end <= beg:
            return np.zeros((0, 2), np.int64)
        bmap = self.bins[tid]
        chunks = [c for b in self._reg2bins(beg, end)
                  if (c := self.bin_chunks(tid, b)) is not None]
        if not chunks:
            return np.zeros((0, 2), np.int64)
        allc = np.concatenate(chunks)
        lin = self.linear[tid]
        if lin.size:
            w = min(beg >> 14, lin.size - 1)
            min_off = int(lin[w])
            allc = allc[allc[:, 1] > min_off]
        return merge_ranges(allc)


def merge_ranges(ranges: np.ndarray) -> np.ndarray:
    """Union of (start, end) ranges, sorted and coalesced."""
    if ranges.shape[0] == 0:
        return ranges.reshape(0, 2)
    order = np.argsort(ranges[:, 0], kind="stable")
    r = ranges[order]
    reach = np.maximum.accumulate(r[:, 1])
    head = np.empty(r.shape[0], bool)
    head[0] = True
    head[1:] = r[1:, 0] > reach[:-1]
    ends = np.maximum.reduceat(r[:, 1], np.flatnonzero(head))
    return np.stack([r[head, 0], ends], axis=1).astype(np.int64)


def load_index_for(bam_path: str) -> Optional[BamIndex]:
    import os

    for suf in (".bai", ".csi"):
        p = bam_path + suf
        if os.path.exists(p):
            try:
                return BamIndex.load(p)
            except (ValueError, struct.error, OSError):
                return None
    return None


def full_file_splits(index: BamIndex, n_parts: int) -> np.ndarray:
    """Partition the whole record stream into ~n_parts virtual-offset
    ranges at chunk starts (guaranteed record boundaries), enabling a
    parallel full-file walk. The final range is open-ended so trailing
    records (e.g. unplaced reads) are still visited."""
    v0s = []
    for tid in range(index.n_ref):
        for b in index.bins[tid]:
            v0s.append(index.bin_chunks(tid, b)[:, 0])
    if not v0s:
        return np.zeros((0, 2), np.int64)
    starts = np.unique(np.concatenate(v0s))
    if starts.size == 0:
        return np.zeros((0, 2), np.int64)
    picks = starts[np.linspace(0, starts.size - 1,
                               min(n_parts, starts.size),
                               dtype=np.int64)]
    picks = np.unique(picks)
    ends = np.concatenate([picks[1:], [np.iinfo(np.int64).max]])
    return np.stack([picks, ends], axis=1)


def chunks_for_windows(index: BamIndex, windows) -> np.ndarray:
    """Merged virtual ranges covering every fetch window
    ((per_tid_off, starts0, ends0) as produced by
    TargetSet.fetch_windows).

    Batched per tid: reg2bins is vectorized over all of a contig's
    windows and the linear-index cut uses the contig-wide minimum, so
    the selection may be a slight superset of per-window queries —
    harmless, the record walk region-filters — at a fraction of the
    cost (dense gene sets have tens of thousands of windows)."""
    off, starts, ends = windows[:3]
    starts = np.asarray(starts, np.int64)
    ends = np.asarray(ends, np.int64)
    parts = []
    for tid in range(min(len(off) - 1, index.n_ref)):
        a, b = int(off[tid]), int(off[tid + 1])
        bmap = index.bins[tid]
        if b <= a or not bmap:
            continue
        beg = starts[a:b]
        end = np.maximum(ends[a:b], beg + 1) - 1
        needed: set = set()
        s_, t_ = index.min_shift + 3 * index.depth, 0
        for l_ in range(index.depth + 1):
            lo = t_ + (beg >> s_)
            hi = t_ + (end >> s_)
            cnt = hi - lo + 1
            tot = int(cnt.sum())
            first = np.repeat(lo - (np.cumsum(cnt) - cnt), cnt)
            needed.update((first + np.arange(tot)).tolist())
            s_ -= 3
            t_ += 1 << (3 * l_)
        allc = index.bulk_bin_chunks(
            tid, needed.intersection(bmap.keys()))
        if allc.shape[0] == 0:
            continue
        lin = index.linear[tid]
        if lin.size:
            w = np.minimum(beg >> 14, lin.size - 1)
            min_off = int(lin[w].min())
            allc = allc[allc[:, 1] > min_off]
        parts.append(allc)
    if not parts:
        return np.zeros((0, 2), np.int64)
    return merge_ranges(np.concatenate(parts))
