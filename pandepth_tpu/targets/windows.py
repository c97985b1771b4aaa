"""Default-region synthesis for chromosome and window modes.

When no GFF/BED targets exist the reference tiles every contig with
pseudo-genes (src/PanDepth.cpp:3975-4051):

- no ``-w``: mode 0 (chr), 10 Mb bins;
- ``-w`` < 150: mode 6, 10 Mb bins (the real small windows are applied
  at stat time over whole-contig depth, src/PanDepth.cpp:4290-4417);
- ``-w`` >= 150: mode 5, bins of exactly the window size.

The tiling loop starts with ``End = 2`` and tests ``End <= len`` before
each iteration, so contigs of length < 2 get NO regions at all and are
absent from every output table — replicated here.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from pandepth_tpu.config import (MEM_BIN_WINDOWS, MODE_CHR, MODE_WIN_BIG,
                                 MODE_WIN_SMALL)
from pandepth_tpu.targets.model import GeneAccumulator, TargetSet


def synthesize_default_targets(
        names: Sequence[str], lengths: np.ndarray, win_size: int,
        ref_bases: Optional[Dict[int, bytes]] = None
) -> Tuple[int, TargetSet]:
    """Return (mode, targets) tiling every contig; see module docstring."""
    if win_size == 0:
        mode, bin_w = MODE_CHR, MEM_BIN_WINDOWS
    elif win_size < 150:
        mode, bin_w = MODE_WIN_SMALL, MEM_BIN_WINDOWS
    else:
        mode, bin_w = MODE_WIN_BIG, win_size

    acc = GeneAccumulator(mode, ref_bases)
    for tid, name in enumerate(names):
        clen = int(lengths[tid])
        end = 2
        start = 1
        while end <= clen:
            end = min(start + bin_w - 1, clen)
            acc.add(tid, name + str(start), start, end)
            end += 2
            start += bin_w
    return mode, acc.build()


def small_window_tiling(chr_len: int, win_size: int) -> np.ndarray:
    """Mode-6 stat windows for one contig: 1-based [start, end] pairs.

    Replicates ``for (j = 1; j < CC; j += WinSize)`` with
    ``End = min(j - 1 + WinSize, CC)`` (src/PanDepth.cpp:4313-4317) —
    note the strict ``j < CC`` drops a final 1-base window when the
    contig length falls exactly on a window boundary + 1.
    """
    starts = np.arange(1, chr_len, win_size, dtype=np.int64)
    ends = np.minimum(starts + win_size - 1, chr_len)
    return np.stack([starts, ends], axis=1)
