"""Flattened genome coordinate layout.

Every contig owns a contiguous range of a single global int64 axis,
padded by ``PAD`` cells so alignments overhanging a contig end land in
dedicated slack instead of the next contig (the reference allocates
+500 slack cells per contig for the same reason,
src/PanDepth.cpp:4137,1510; we use 512).
"""

from __future__ import annotations

import numpy as np

PAD = 512


class GenomeLayout:
    def __init__(self, lengths: np.ndarray, pad: int = PAD):
        self.lengths = np.asarray(lengths, np.int64)
        self.pad = pad
        sizes = self.lengths + pad
        self.offsets = np.concatenate(
            ([0], np.cumsum(sizes)))[:-1].astype(np.int64)
        # first cell past each contig's slack (exclusive clamp limit)
        self.limits = (self.offsets + sizes).astype(np.int64)
        self.total = int(sizes.sum())

    @property
    def n_targets(self) -> int:
        return int(self.lengths.shape[0])

    def global_pos(self, tid: np.ndarray, pos: np.ndarray) -> np.ndarray:
        return self.offsets[tid] + pos

    def shard_bounds(self, n_shards: int) -> np.ndarray:
        """(n_shards+1,) int64 cut points over the global axis (contiguous
        equal ranges; contigs may straddle cuts — stats are additive over
        position ranges so straddling is harmless)."""
        step = -(-self.total // n_shards)
        cuts = np.minimum(np.arange(n_shards + 1, dtype=np.int64) * step,
                          self.total)
        return cuts
