"""The fast-start ``pandepth`` launcher (python -S + deferred jax init,
pandepth_tpu/boot.py) must produce byte-identical tables to the
in-process CLI."""

import gzip
import os
import subprocess
import sys

from pandepth_tpu.cli import main as cli_main

from fixtures import make_bam, make_gff

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "pandepth")


def _read(path):
    with gzip.open(path, "rb") as fh:
        return fh.read()


def _launcher_env():
    env = dict(os.environ)
    # the launcher subprocess must not touch the TPU tunnel (remote
    # compiles take minutes); config-level override beats the axon
    # sitecustomize hook
    env["PANDEPTH_FORCE_PLATFORM"] = "cpu"
    env["PANDEPTH_JAX_CACHE"] = os.path.expanduser(
        "~/.cache/pandepth_jax_cpu")
    return env


def test_launcher_matches_inprocess(tmp_path):
    bam = str(tmp_path / "t.bam")
    gff = str(tmp_path / "t.gff")
    make_bam(bam, n=600, seed=5)
    make_gff(gff)

    rc = cli_main(["pandepth", "-i", bam, "-g", gff, "-o",
                   str(tmp_path / "inproc")])
    assert rc == 0

    r = subprocess.run(
        [sys.executable, "-S", LAUNCHER, "-i", bam, "-g", gff, "-o",
         str(tmp_path / "launched")],
        capture_output=True, text=True, timeout=600,
        env=_launcher_env())
    assert r.returncode == 0, r.stderr[-2000:]
    assert _read(str(tmp_path / "launched.gene.stat.gz")) == \
        _read(str(tmp_path / "inproc.gene.stat.gz"))


def test_launcher_host_run_spawns_no_daemon(tmp_path):
    """Engine-aware routing (boot.main): a host-engine run executes
    in-process — no daemon socket appears, output matches the
    in-process CLI, and a forced PANDEPTH_HOST_FINALIZE=1 is honored
    rather than silently overridden by daemon routing."""
    bam = str(tmp_path / "t.bam")
    make_bam(bam, n=400, seed=6)
    rc = cli_main(["pandepth", "-i", bam,
                   "-o", str(tmp_path / "inproc")])
    assert rc == 0

    sock = str(tmp_path / "d.sock")
    env = _launcher_env()
    env["PANDEPTH_HOST_FINALIZE"] = "1"
    env["PANDEPTH_DAEMON_SOCK"] = sock
    env.pop("PANDEPTH_DAEMON", None)  # "auto": daemon would be default
    r = subprocess.run(
        [sys.executable, "-S", LAUNCHER, "-i", bam, "-o",
         str(tmp_path / "hosted")],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert not os.path.exists(sock), "host run must not spawn a daemon"
    assert _read(str(tmp_path / "hosted.chr.stat.gz")) == \
        _read(str(tmp_path / "inproc.chr.stat.gz"))


def test_launcher_help_is_sitecustomize_free(tmp_path):
    """-h must not pay the jax import (it exits before boot matters),
    and the launcher must run even when sitecustomize is absent."""
    r = subprocess.run([sys.executable, "-S", LAUNCHER, "-h"],
                       capture_output=True, text=True, timeout=120,
                       env=_launcher_env())
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Usage: pandepth" in r.stdout
