"""pandepth_tpu — a TPU-native genomic coverage framework.

A from-scratch re-design of the capabilities of PanDepth
(https://github.com/HuiyangYu/PanDepth, reference layout surveyed in
SURVEY.md) for TPU hardware:

* hosts decode alignment files (SAM/BAM/CRAM/PAF) into flat columnar
  batches (``pandepth_tpu.io``),
* CIGAR expansion, FLAG/MAPQ filtering and per-base depth accumulation
  run on-device as difference-array scatter + prefix-scan ops
  (``pandepth_tpu.ops``),
* interval statistics (Length / CoveredSite / TotalDepth / Coverage% /
  MeanDepth / GC%) for chromosomes, windows, BED regions and GFF/GTF
  features fall out as masked-prefix-sum boundary gathers,
* multi-chip scaling uses ``jax.sharding`` meshes with psum /
  reduce_scatter merges (``pandepth_tpu.parallel``).

The CLI (``pandepth_tpu.cli``) is flag-compatible with the reference
``pandepth`` binary and produces byte-identical (decompressed) stat
tables.
"""

__version__ = "0.1.0"

from pandepth_tpu.config import RunConfig  # noqa: F401
