"""Malformed-input handling: clean errors, no tracebacks, no partial
garbage output."""

import glob
import gzip
import os

import pytest

from tests.fixtures import make_bam

from pandepth_tpu.cli import main as cli_main


def _run(tmp, args):
    return cli_main(["pandepth"] + args + ["-o", os.path.join(tmp, "o")])


def test_missing_input(tmp_path, capsys):
    rc = _run(str(tmp_path), ["-i", str(tmp_path / "nope.bam")])
    assert rc != 0
    err = capsys.readouterr().err
    assert "Error" in err
    assert "Traceback" not in err


def test_garbage_bam(tmp_path, capsys):
    tmp = str(tmp_path)
    p = os.path.join(tmp, "g.bam")
    with open(p, "wb") as fh:
        fh.write(b"\x1f\x8b" + os.urandom(500))
    rc = _run(tmp, ["-i", p])
    assert rc != 0 or not glob.glob(os.path.join(tmp, "o*.gz"))


def test_truncated_bam(tmp_path):
    tmp = str(tmp_path)
    good = os.path.join(tmp, "t.bam")
    make_bam(good, n=200, seed=3)
    data = open(good, "rb").read()
    bad = os.path.join(tmp, "trunc.bam")
    with open(bad, "wb") as fh:
        fh.write(data[: len(data) // 2])
    rc = _run(tmp, ["-i", bad])
    # either a clean nonzero error or no output claimed
    if rc == 0:
        assert glob.glob(os.path.join(tmp, "o*.gz"))


def test_text_file_as_bam(tmp_path, capsys):
    tmp = str(tmp_path)
    p = os.path.join(tmp, "t.bam")
    with open(p, "w") as fh:
        fh.write("this is not a bam\n")
    rc = _run(tmp, ["-i", p])
    # sniffed as SAM text with no header: empty genome, no crash
    assert rc in (0, 1)


def test_empty_bed(tmp_path):
    tmp = str(tmp_path)
    bam = os.path.join(tmp, "t.bam")
    make_bam(bam, n=100, seed=5)
    bed = os.path.join(tmp, "e.bed")
    open(bed, "w").close()
    rc = _run(tmp, ["-i", bam, "-b", bed])
    # empty targets fall back to chr mode (reference synthesizes
    # default regions when RegionMerger is empty)
    assert rc == 0
    out = glob.glob(os.path.join(tmp, "o*.gz"))
    assert out and out[0].endswith("chr.stat.gz")
    with gzip.open(out[0], "rt") as fh:
        assert fh.readline().startswith("#Chr")


def _bgzf_wrap(payload: bytes) -> bytes:
    """One BGZF member + EOF marker around raw payload bytes."""
    import struct
    import zlib

    def member(pl):
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(pl) + co.flush()
        bsize = len(cdata) + 26
        return (struct.pack("<4BI2BH2BH H", 0x1F, 0x8B, 8, 4, 0, 0,
                            0xFF, 6, 0x42, 0x43, 2, bsize - 1) + cdata +
                struct.pack("<II", zlib.crc32(pl) & 0xFFFFFFFF, len(pl)))

    eof = bytes.fromhex("1f8b08040000000000ff0600424302001b0003000000"
                        "000000000000")
    return member(payload) + eof


def test_hostile_header_zero_lname(tmp_path):
    """A header claiming l_name=0 must be a clean error, not a segfault
    (size_t wrap in parse_header)."""
    import struct

    payload = (b"BAM\x01" + struct.pack("<I", 0) +          # no text
               struct.pack("<I", 1) +                        # n_ref=1
               struct.pack("<I", 0) +                        # l_name=0 !
               struct.pack("<I", 1000))
    p = str(tmp_path / "h.bam")
    with open(p, "wb") as fh:
        fh.write(_bgzf_wrap(payload))
    rc = _run(str(tmp_path), ["-i", p])
    assert rc != 0 or not glob.glob(str(tmp_path / "o*.gz"))


def test_hostile_record_huge_ncigar(tmp_path, capsys):
    """A 36-byte record claiming n_cigar=60000 must be rejected, not
    decoded via out-of-bounds heap reads."""
    import struct

    hdr = (b"BAM\x01" + struct.pack("<I", 0) +
           struct.pack("<I", 1) +
           struct.pack("<I", 5) + b"chr1\x00" +
           struct.pack("<I", 1000))
    # block_size=36: fixed 32 + l_read_name(2) -> room for ZERO cigar
    # ops, but n_cigar claims 60000
    rec = struct.pack("<iiBBHHHiiii", 0, 10, 2, 30, 4680, 60000, 0,
                      0, -1, -1, 0) + b"r\x00"
    payload = hdr + struct.pack("<I", len(rec)) + rec
    p = str(tmp_path / "r.bam")
    with open(p, "wb") as fh:
        fh.write(_bgzf_wrap(payload))
    rc = _run(str(tmp_path), ["-i", p])
    assert rc != 0 or not glob.glob(str(tmp_path / "o*.gz"))
    assert "Traceback" not in capsys.readouterr().err


def test_bad_gff_rejected(tmp_path, capsys):
    tmp = str(tmp_path)
    bam = os.path.join(tmp, "t.bam")
    make_bam(bam, n=50, seed=6)
    gff = os.path.join(tmp, "bad.gff")
    with open(gff, "w") as fh:
        fh.write("just some random text\nwith no gff structure\n")
    rc = _run(tmp, ["-i", bam, "-g", gff])
    err = capsys.readouterr().err
    assert "incorrect" in err
    assert not glob.glob(os.path.join(tmp, "o*.gz"))
