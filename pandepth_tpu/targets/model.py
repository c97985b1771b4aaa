"""Target/region model.

The reference keeps per-target accumulators in
``map<int, map<string, GeneInfo>>`` (GeneInfo: include/DataClass.h:62-80)
keyed by (tid, gene-id), where each record appends a (start, end) segment
to ``CDSList`` and updates span/length (src/PanDepth.cpp:3638-3641).
We keep the same merge semantics but flatten everything into columnar
numpy arrays ready for the device sweep:

- one row per *gene* (= output table row),
- one row per *segment* (= CDSList entry), linked to its gene.

Coordinates follow the reference convention: 1-based inclusive
``[start, end]`` in the input files; the device sweep works on 0-based
half-open ``[start-1, end)``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class TargetSet:
    """Columnar target regions (genes + their segments)."""

    mode: int
    # per-gene arrays (row index = gene index, insertion order)
    gene_tid: np.ndarray      # int32
    gene_id: List[str]
    gene_start: np.ndarray    # int64, 1-based min segment start
    gene_end: np.ndarray      # int64, 1-based max segment end
    gene_length: np.ndarray   # int64, sum of segment lengths (overlaps double-count)
    gene_gc: np.ndarray       # int64, GC base count over segments (0 if no ref)
    # per-segment arrays
    seg_gene: np.ndarray      # int32 -> gene row
    seg_start: np.ndarray     # int64, 1-based inclusive
    seg_end: np.ndarray       # int64, 1-based inclusive

    @property
    def n_genes(self) -> int:
        return int(self.gene_tid.shape[0])

    @property
    def n_segments(self) -> int:
        return int(self.seg_start.shape[0])

    def tids_with_regions(self) -> np.ndarray:
        """Sorted unique tids that have at least one target (the key set of
        the reference's RegionMerger, src/PanDepth.cpp:3912-3972)."""
        return np.unique(self.gene_tid)


class GeneAccumulator:
    """Replicates the reference's (tid, gene-id) keyed accumulation.

    Repeated records for the same key take min start / max end, sum the
    per-record span into GeneLength, and append the segment
    (src/PanDepth.cpp:3638-3641). GC quirk: the reference counts GC over
    ``[start-1, end)`` only in the branches that *create* a GeneInfo —
    the merge branch never touches GeneGCGC (src/PanDepth.cpp:3646-3650)
    — so a multi-segment gene's GC(%) is its first segment's GC count
    over the summed length. Replicated.
    """

    def __init__(self, mode: int,
                 ref_bases: Optional[Dict[int, bytes]] = None):
        self.mode = mode
        self._ref = ref_bases
        self._index: Dict[Tuple[int, str], int] = {}
        self._tid: List[int] = []
        self._id: List[str] = []
        self._start: List[int] = []
        self._end: List[int] = []
        self._length: List[int] = []
        self._gc: List[int] = []
        self._seg_gene: List[int] = []
        self._seg_start: List[int] = []
        self._seg_end: List[int] = []

    def _gc_count(self, tid: int, start: int, end: int) -> int:
        if self._ref is None:
            return 0
        seq = self._ref.get(tid)
        if seq is None:
            return 0
        frag = seq[max(start - 1, 0): end]
        return frag.count(b"G") + frag.count(b"C") + \
            frag.count(b"g") + frag.count(b"c")

    def add(self, tid: int, gene_id: str, start: int, end: int) -> None:
        key = (tid, gene_id)
        row = self._index.get(key)
        if row is None:
            row = len(self._tid)
            self._index[key] = row
            self._tid.append(tid)
            self._id.append(gene_id)
            self._start.append(start)
            self._end.append(end)
            self._length.append(end - start + 1)
            self._gc.append(self._gc_count(tid, start, end))
        else:
            if start < self._start[row]:
                self._start[row] = start
            if end > self._end[row]:
                self._end[row] = end
            self._length[row] += end - start + 1
            # no GC accumulation on merge (reference quirk, see class doc)
        self._seg_gene.append(row)
        self._seg_start.append(start)
        self._seg_end.append(end)

    def build(self) -> TargetSet:
        return TargetSet(
            mode=self.mode,
            gene_tid=np.asarray(self._tid, np.int32),
            gene_id=list(self._id),
            gene_start=np.asarray(self._start, np.int64),
            gene_end=np.asarray(self._end, np.int64),
            gene_length=np.asarray(self._length, np.int64),
            gene_gc=np.asarray(self._gc, np.int64),
            seg_gene=np.asarray(self._seg_gene, np.int32),
            seg_start=np.asarray(self._seg_start, np.int64),
            seg_end=np.asarray(self._seg_end, np.int64),
        )
