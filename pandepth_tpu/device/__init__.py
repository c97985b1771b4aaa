from pandepth_tpu.device.layout import GenomeLayout
from pandepth_tpu.device.engine import CoverageEngine, SegmentStats

__all__ = ["GenomeLayout", "CoverageEngine", "SegmentStats"]
