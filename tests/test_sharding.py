"""Multi-device sharding tests on the 8-virtual-CPU mesh
(SURVEY.md §4.4): the sharded coverage step must equal the single-chip
engine bit-for-bit."""

import jax
import numpy as np
import pytest

from pandepth_tpu.device.engine import CoverageEngine
from pandepth_tpu.device.layout import GenomeLayout
from pandepth_tpu.io.bam import ReadBatch
from pandepth_tpu.sharding.mesh import make_mesh, sharded_coverage_step

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _problem(n_dev, seed=1):
    rng = np.random.RandomState(seed)
    lengths = np.array([7000, 4000, 900], np.int64)
    layout = GenomeLayout(lengths)
    n = 32 * n_dev
    tid = rng.randint(0, 3, n).astype(np.int32)
    pos = rng.randint(0, 3500, n).astype(np.int32)
    flag = np.where(rng.rand(n) < 0.15, 256, 0).astype(np.int32)
    mapq = rng.randint(0, 61, n).astype(np.int32)
    opr = np.repeat(np.arange(n, dtype=np.int32), 2)
    opc = np.tile(np.array([0, 2], np.int32), n)  # M then D
    opl = rng.randint(1, 99, 2 * n).astype(np.int32)

    seg_tid = np.array([0, 0, 1, 2, 2], np.int32)
    s1 = np.array([1, 3000, 500, 1, 800], np.int64)
    e1 = np.array([3500, 7000, 4000, 900, 1200], np.int64)
    return layout, (tid, pos, flag, mapq, opc, opl, opr), (seg_tid, s1, e1)


@pytest.mark.parametrize("n_dev,dp", [(8, 2), (8, 1), (4, 2), (2, 1)])
def test_sharded_equals_single_chip(n_dev, dp):
    layout, reads, segs = _problem(n_dev)
    tid, pos, flag, mapq, opc, opl, opr = reads
    seg_tid, s1, e1 = segs

    mesh = make_mesh(jax.devices()[:n_dev], dp=dp)
    per_read = tid.shape[0] // n_dev
    opr_local = (opr % per_read).astype(np.int32)

    step = sharded_coverage_step(mesh, flags_mask=1796, min_mapq=20,
                                 min_dep=2)
    bounds = jnp.asarray(layout.shard_bounds(n_dev))
    seg_lo = jnp.asarray(layout.offsets[seg_tid] + s1 - 1)
    seg_hi = jnp.asarray(np.minimum(layout.offsets[seg_tid] + e1,
                                    layout.limits[seg_tid]))
    cover, dsum = step(jnp.asarray(tid), jnp.asarray(pos),
                       jnp.asarray(flag), jnp.asarray(mapq),
                       jnp.asarray(opc), jnp.asarray(opl),
                       jnp.asarray(opr_local),
                       jnp.asarray(layout.offsets),
                       jnp.asarray(layout.limits),
                       bounds, seg_lo, seg_hi)

    eng = CoverageEngine(layout, flags_mask=1796, min_mapq=20, min_dep=2)
    eng.add_batch(ReadBatch(tid, pos, flag, mapq,
                            np.full(tid.shape[0], 2, np.int32),
                            opc, opl, opr))
    st = eng.segment_stats(seg_tid, s1, e1)
    np.testing.assert_array_equal(np.asarray(cover), st.cover)
    np.testing.assert_array_equal(np.asarray(dsum), st.depth_sum)


def test_graft_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None
    ge.dryrun_multichip(8)
