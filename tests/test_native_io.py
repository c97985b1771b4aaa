"""libpancov_io (C++ decoder) vs the pure-Python BAM reader: identical
headers and columnar batches on every fixture."""

import numpy as np
import pytest

from pandepth_tpu.io.bam import BamReader

from tests.fixtures import make_bam


@pytest.fixture(scope="module")
def native():
    native_mod = pytest.importorskip("pandepth_tpu.io.native")
    if native_mod.load_library() is None:
        pytest.skip(f"native build failed: {native_mod.build_error()}")
    return native_mod


def test_native_matches_python(tmp_path, native):
    bam = str(tmp_path / "t.bam")
    make_bam(bam, n=700, seed=33)
    py = BamReader(bam)
    nt = native.NativeBamReader(bam)
    assert nt.header.names == py.header.names
    assert (nt.header.lengths == py.header.lengths).all()
    assert nt.header.text == py.header.text

    for bp, bn in zip(py.batches(max_reads=123),
                      nt.batches(max_reads=123)):
        for f in ("tid", "pos", "flag", "mapq", "n_ops", "op_code",
                  "op_len", "op_read"):
            np.testing.assert_array_equal(getattr(bp, f),
                                          getattr(bn, f), err_msg=f)
    nt.close()


def test_native_empty_and_errors(tmp_path, native):
    bam = str(tmp_path / "e.bam")
    make_bam(bam, n=0)
    nt = native.NativeBamReader(bam)
    assert nt.n_records == 0
    assert list(nt.batches()) == []
    nt.close()

    with pytest.raises(ValueError):
        native.NativeBamReader(str(tmp_path / "missing.bam"))

    bad = str(tmp_path / "bad.bam")
    with open(bad, "wb") as fh:
        fh.write(b"this is not a bam file at all")
    with pytest.raises(ValueError):
        native.NativeBamReader(bad)
