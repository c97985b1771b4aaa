"""Multi-chip scaling: read-batch data parallelism x genome-range
sharding over a 2-D device mesh.

The reference's only parallelism is one process's std::threads over
chromosome groups (scheduler at src/PanDepth.cpp:4151-4260). The TPU
mapping (SURVEY.md §2.3):

- axis ``dp``  — read batches are sharded across devices (the decode
  feed is embarrassingly parallel);
- axis ``gs`` — the flattened genome axis is cut into contiguous
  ranges; coverage statistics are *additive over disjoint position
  ranges*, so each device sweeps only its range and the final tables
  are one ``psum`` away.

Every (dp, gs) program owns the genome range indexed by its flattened
mesh position, so all ``dp x gs`` devices sweep distinct ranges — the
2-D mesh is a convenience for feeding reads, not a replication grid.
Events cross the mesh with one ``all_gather`` (ICI); the depth carried
into a range is the sum of all event deltas left of it, injected as a
single synthetic event at the range start.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pandepth_tpu.device.events import SENTINEL, extract_events
from pandepth_tpu.device import sweep as sweep_mod


def make_mesh(devices: Optional[Sequence] = None,
              dp: Optional[int] = None) -> Mesh:
    """Build a (dp, gs) mesh over the given (or all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = 2 if n % 2 == 0 and n >= 4 else 1
    gs = n // dp
    arr = np.asarray(devices[: dp * gs]).reshape(dp, gs)
    return Mesh(arr, ("dp", "gs"))


def shard_map_fn(fn, mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def sharded_coverage_step(mesh: Mesh, flags_mask: int, min_mapq: int,
                          min_dep: int, wrap18: bool = False):
    """Build a jitted full coverage step over the mesh.

    The returned function takes globally-shaped arrays:
      tid/pos/flag/mapq: (N,) int32 — reads, sharded over (dp, gs)
      op_code/op_len/op_read: (M,) int32 — CIGAR stream, sharded over
        (dp, gs); op_read indexes into the *local* read shard
      offsets/limits: (n_targets,) int64 — replicated genome layout
      bounds: (n_dev + 1,) int64 — replicated genome range cuts
      seg_lo/seg_hi: (B,) int64 — replicated segment boundaries
    and returns replicated (cover, depth_sum) int64 arrays of shape (B,).
    """
    axes = ("dp", "gs")
    n_gs = mesh.shape["gs"]

    def step(tid, pos, flag, mapq, opc, opl, opr, offsets, limits,
             bounds, seg_lo, seg_hi):
        ev_pos, ev_delta = extract_events(
            tid, pos, flag, mapq, opc, opl, opr, offsets, limits,
            flags_mask=flags_mask, min_mapq=min_mapq)
        # one hop over ICI: every device sees every event
        ev_pos = jax.lax.all_gather(ev_pos, axes, tiled=True)
        ev_delta = jax.lax.all_gather(ev_delta, axes, tiled=True)

        rid = jax.lax.axis_index("dp") * n_gs + jax.lax.axis_index("gs")
        lo = bounds[rid]
        hi = bounds[rid + 1]

        # depth flowing into this range + events inside it
        left = ev_pos < lo
        carry = jnp.sum(jnp.where(left, ev_delta, 0), dtype=jnp.int32)
        inside = (ev_pos >= lo) & (ev_pos < hi)
        pos_m = jnp.where(inside, ev_pos, SENTINEL)
        del_m = jnp.where(inside, ev_delta, 0)
        pos2 = jnp.concatenate([jnp.full((1,), lo, jnp.int64), pos_m])
        del2 = jnp.concatenate([carry[None], del_m])

        pos_s, depth, c_cov, c_sum, _ = sweep_mod.sort_events(
            pos2, del2, min_dep=min_dep, wrap18=wrap18)
        md = jnp.int32(min_dep)
        lo_q = jnp.clip(seg_lo, lo, hi)
        hi_q = jnp.clip(seg_hi, lo, hi)
        ql_c, ql_s = sweep_mod.eval_boundaries(pos_s, depth, c_cov,
                                               c_sum, md, lo_q)
        qh_c, qh_s = sweep_mod.eval_boundaries(pos_s, depth, c_cov,
                                               c_sum, md, hi_q)
        cover = jax.lax.psum(qh_c - ql_c, axes)
        dsum = jax.lax.psum(qh_s - ql_s, axes)
        return cover, dsum

    sharded = shard_map_fn(
        step, mesh,
        in_specs=(P(axes), P(axes), P(axes), P(axes),   # reads
                  P(axes), P(axes), P(axes),            # cigar stream
                  P(), P(), P(), P(), P()),             # replicated
        out_specs=(P(), P()))
    return jax.jit(sharded)
