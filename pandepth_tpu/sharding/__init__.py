from pandepth_tpu.sharding.mesh import (make_mesh, sharded_coverage_step)

__all__ = ["make_mesh", "sharded_coverage_step"]
