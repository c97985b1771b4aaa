"""pandepth_tpu — a TPU-native genomic coverage framework.

A from-scratch re-design of the capabilities of PanDepth
(https://github.com/HuiyangYu/PanDepth, reference layout surveyed in
SURVEY.md) for TPU hardware:

* hosts decode alignment files (SAM/BAM/CRAM/PAF) into coverage events
  (``pandepth_tpu.io`` + the C++ ``io/native`` library),
* depth reconstruction and region statistics run on-device as one
  sort + prefix scans + boundary gathers (``pandepth_tpu.device``),
* interval statistics (Length / CoveredSite / TotalDepth / Coverage% /
  MeanDepth / GC%) for chromosomes, windows, BED regions and GFF/GTF
  features are prefix-integral differences (``pandepth_tpu.stats``),
* multi-chip scaling shards genome ranges over a ``jax.sharding`` mesh
  with psum merges (``pandepth_tpu.sharding``).

The CLI (``pandepth_tpu.cli``) is flag-compatible with the reference
``pandepth`` binary and produces byte-identical (decompressed) stat
tables.
"""

__version__ = "0.1.0"

# Genome coordinates are flattened onto one global int64 axis (a 3 Gb
# genome overflows int32), so 64-bit types must be real, not silently
# truncated. Set before any jax array is created.
import os as _os

import jax as _jax

_jax.config.update("jax_enable_x64", True)

# CLI-style workloads pay full jit cost per process; a persistent
# compile cache makes repeat invocations start in milliseconds.
_cache = _os.environ.get("PANDEPTH_JAX_CACHE",
                         _os.path.expanduser("~/.cache/pandepth_jax"))
if _cache and _cache != "0":
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # cache is an optimization only
        pass

from pandepth_tpu.config import RunConfig  # noqa: F401,E402
