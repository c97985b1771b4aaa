"""BAI/CSI index parsing and the ranged (block-skipping) load path."""

import numpy as np

from pandepth_tpu.io.bamindex import (BamIndex, chunks_for_windows,
                                      load_index_for, merge_ranges)

from tests.fixtures import CONTIGS, make_bam


def test_load_and_query(tmp_path):
    bam = str(tmp_path / "t.bam")
    recs = make_bam(bam, n=600, seed=21)
    idx = load_index_for(bam)
    assert idx is not None
    assert idx.n_ref == len(CONTIGS)
    # a region with reads must yield chunks; far-away region on ctgM
    ch = idx.query(0, 0, CONTIGS[0][1])
    assert ch.shape[0] >= 1
    assert (ch[:, 1] > ch[:, 0]).all()
    # over-fetch beyond the data is allowed (the read-overlap filter
    # rejects later); degenerate queries return nothing
    assert idx.query(0, 100, 100).shape[0] == 0
    assert idx.query(-1, 0, 100).shape[0] == 0
    assert idx.query(99, 0, 100).shape[0] == 0


def test_merge_ranges():
    r = np.array([[10, 20], [15, 30], [40, 50], [50, 60], [5, 8]])
    m = merge_ranges(r)
    assert m.tolist() == [[5, 8], [10, 30], [40, 60]]


def test_ranged_load_equals_full(tmp_path):
    import pytest

    native = pytest.importorskip("pandepth_tpu.io.native")
    if native.load_library() is None:
        pytest.skip("native unavailable")
    from pandepth_tpu.device.layout import GenomeLayout

    bam = str(tmp_path / "t.bam")
    make_bam(bam, n=800, seed=31)
    lengths = np.array([c[1] for c in CONTIGS])
    lay = GenomeLayout(lengths)

    # fetch windows over a sparse subset
    off = np.array([0, 1, 2, 2], np.int64)
    starts = np.array([1000, 500], np.int64)
    ends = np.array([2000, 1500], np.int64)
    windows = (off, starts, ends, 1)

    full = native.NativeBamLoad(bam, 1796, -1, regions=windows)
    fs, fe = full.events()
    full.close()

    idx = load_index_for(bam)
    vr = chunks_for_windows(idx, windows)
    assert vr.shape[0] >= 1
    ranged = native.NativeBamLoad(bam, 1796, -1, regions=windows,
                                  vranges=vr)
    rs, re_ = ranged.events()
    ranged.close()
    np.testing.assert_array_equal(np.sort(fs), np.sort(rs))
    np.testing.assert_array_equal(np.sort(fe), np.sort(re_))
