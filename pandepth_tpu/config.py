"""Run configuration for the coverage engine.

Mirrors the reference CLI surface (reference: src/PanDepth.cpp:59-293,
defaults from include/DataClass.h:41-58) while remaining an ordinary
dataclass for programmatic use.

Target-mode encoding (reference ``InInt2``, src/PanDepth.cpp:3979-3992):

====  =========================================================
mode  meaning
====  =========================================================
0     whole chromosomes (no -g/-b/-w)
1     GFF  (``Parent``-style attributes)
2     GTF  (``transcript_id``-style attributes)
3     BED, 3 columns (RegionID synthesized as Chr_Start_End)
4     BED, 4 columns (4th column is the region ID)
5     fixed windows, width >= 150
6     fixed windows, width < 150
====  =========================================================
"""

from __future__ import annotations

import dataclasses
from typing import List

# Default FLAG exclusion mask: UNMAP(4) | SECONDARY(256) | QCFAIL(512) | DUP(1024)
DEFAULT_FLAGS = 1796

MODE_CHR = 0
MODE_GFF = 1
MODE_GTF = 2
MODE_BED3 = 3
MODE_BED4 = 4
MODE_WIN_BIG = 5   # window size >= 150
MODE_WIN_SMALL = 6  # window size < 150

# Reference bin width used for chr-mode pseudo regions and the low-memory
# genome sweep (src/PanDepth.cpp:3977 MeMBinWindows).
MEM_BIN_WINDOWS = 10_000_000


@dataclasses.dataclass
class RunConfig:
    """All knobs of a coverage run (CLI flags map 1:1)."""

    inputs: List[str] = dataclasses.field(default_factory=list)  # -i (expanded .list)
    out_prefix: str = ""            # -o
    target_file: str = ""           # -g or -b path
    mode: int = MODE_CHR            # InInt2
    feature_type: str = "CDS"       # -f
    win_size: int = 0               # -w
    site_output: bool = False       # -a
    min_mapq: int = -1              # -q  (default -1: no filter; help says [0])
    min_depth: int = 1              # -d
    flags: int = DEFAULT_FLAGS      # -x
    threads: int = 3                # -t
    reference: str = ""             # -r
    gc: bool = False                # -c
    use_index: bool = True          # hidden -s flag sets False

    # --- engine knobs (no reference equivalent) ---
    max_reads_per_batch: int = 1 << 20
    verbose: bool = False
    # Documented divergence (quirk Q4): the reference clears RefBase
    # before the mode-6 window writer runs, so its GC(%) column reads
    # freed memory — nondeterministic garbage (src/PanDepth.cpp:4094 vs
    # :4327). We compute real GC by default; True emits 0.00 instead.
    quirk_mode6_gc_zero: bool = False

    @property
    def mapq_filter_active(self) -> bool:
        # reference: uint8 qual < int(-1) is never true (quirk Q2)
        return self.min_mapq > 0
