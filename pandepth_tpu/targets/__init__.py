from pandepth_tpu.targets.model import TargetSet, GeneAccumulator
from pandepth_tpu.targets.parse import (
    detect_gff_mode, detect_bed_mode, parse_targets)
from pandepth_tpu.targets.windows import synthesize_default_targets

__all__ = [
    "TargetSet", "GeneAccumulator", "detect_gff_mode", "detect_bed_mode",
    "parse_targets", "synthesize_default_targets",
]
