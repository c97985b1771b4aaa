"""Optional samtools-depth oracle cross-check (SURVEY.md §4.5).

The reference's own accuracy claim is "completely consistent with
samtools depth (version >=1.10)" (/root/reference/README.md:147). The
rest of the suite proves byte parity against the reference binary;
this file closes the loop against samtools itself wherever a samtools
binary is available (``SAMTOOLS`` env var or PATH) and skips cleanly
otherwise — this image ships no samtools.

Comparison: our ``-a`` SiteDepth dump (0-based, all positions of every
regioned contig — in chr mode that is every contig) against
``samtools depth -aa`` (1-based, all positions of all contigs).
Default flag masks agree (both skip UNMAP|SECONDARY|QCFAIL|DUP=1796);
mapq filters map ``pandepth -q N`` == ``samtools depth -Q N``.
"""

import gzip
import os
import shutil
import subprocess

import pytest


def _samtools():
    exe = os.environ.get("SAMTOOLS") or shutil.which("samtools")
    if not exe:
        return None
    try:
        out = subprocess.run([exe, "--version"], capture_output=True,
                             text=True, timeout=30)
        if out.returncode != 0:
            return None
    except (OSError, subprocess.TimeoutExpired):
        return None
    return exe


SAMTOOLS = _samtools()

pytestmark = pytest.mark.skipif(
    SAMTOOLS is None,
    reason="samtools not available (set SAMTOOLS or add to PATH)")


def _our_sites(tmp_path, bam, extra=()):
    from pandepth_tpu.cli import main as cli_main

    prefix = str(tmp_path / "ours")
    rc = cli_main(["pandepth", "-i", bam, "-a", "-o", prefix]
                  + list(extra))
    assert rc == 0
    lines = []
    with gzip.open(prefix + ".SiteDepth.gz", "rt") as fh:
        for ln in fh:
            chrom, pos0, dep = ln.rstrip("\n").split("\t")
            lines.append(f"{chrom}\t{int(pos0) + 1}\t{dep}")
    return lines


def _samtools_sites(bam, extra=()):
    out = subprocess.run([SAMTOOLS, "depth", "-aa", *extra, bam],
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return [ln for ln in out.stdout.splitlines() if ln]


@pytest.mark.parametrize("seed", [71, 72])
def test_site_depth_matches_samtools(tmp_path, seed):
    from tests.fixtures import make_bam

    bam = str(tmp_path / "in.bam")
    make_bam(bam, n=600, seed=seed, end_slack=0)
    ours = _our_sites(tmp_path, bam)
    theirs = _samtools_sites(bam)
    assert ours == theirs


def test_site_depth_matches_samtools_mapq(tmp_path):
    from tests.fixtures import make_bam

    bam = str(tmp_path / "in.bam")
    make_bam(bam, n=600, seed=73, end_slack=0)
    ours = _our_sites(tmp_path, bam, extra=["-q", "30"])
    theirs = _samtools_sites(bam, extra=["-Q", "30"])
    assert ours == theirs
