"""Resident serve mode (pandepth_tpu/serve.py): a foreground server
answers CLI runs shipped over the unix socket with byte-identical
outputs, honors per-request cwd, survives bad requests, and refuses
stale-code clients."""

import gzip
import json
import os
import socket
import subprocess
import sys
import time

import pytest

from tests.fixtures import make_bam

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "pandepth")


def _serve_env(sock):
    env = dict(os.environ)
    env.update({
        "PANDEPTH_DAEMON_SOCK": sock,
        "PANDEPTH_FORCE_PLATFORM": "cpu",
        "PANDEPTH_DAEMON_IDLE_S": "120",
        # keep daemon-side runs cheap (same knobs as conftest)
        "PANDEPTH_ENC_CAP": str(1 << 14),
        "PANDEPTH_ENC_EXC": str(1 << 11),
    })
    return env


def _wait_sock(path, timeout=60.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if os.path.exists(path):
            return
        time.sleep(0.1)
    raise TimeoutError("daemon socket never appeared")


def _client(env, args, cwd, check=True):
    env = dict(env, PANDEPTH_DAEMON="1", PANDEPTH_DAEMON_REQUIRE="1")
    p = subprocess.run([sys.executable, "-S", LAUNCHER] + args,
                       env=env, cwd=cwd, capture_output=True,
                       text=True, timeout=300)
    if check:
        assert p.returncode == 0, p.stderr[-2000:]
    return p


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    bam = str(d / "t.bam")
    make_bam(bam, n=300, seed=3)
    sock = str(d / "d.sock")
    env = _serve_env(sock)
    srv = subprocess.Popen([sys.executable, "-S", LAUNCHER, "--serve"],
                           env=env, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
    _wait_sock(sock)
    yield {"dir": str(d), "bam": bam, "sock": sock, "env": env,
           "srv": srv}
    if srv.poll() is None:
        subprocess.run([sys.executable, "-S", LAUNCHER,
                        "--daemon-stop"], env=env, timeout=60)
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()


def test_serve_matches_direct(served, tmp_path):
    d = served["dir"]
    _client(served["env"], ["-i", served["bam"], "-o", "srv1"], d)
    # direct in-process oracle run of the same config
    direct = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r);"
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from pandepth_tpu.cli import main;"
         "sys.exit(main(['pandepth','-i',%r,'-o','direct1']))"
         % (REPO, served["bam"])],
        cwd=str(tmp_path), env=served["env"], capture_output=True,
        timeout=300)
    assert direct.returncode == 0, direct.stderr[-2000:]
    with gzip.open(os.path.join(d, "srv1.chr.stat.gz")) as fh:
        a = fh.read()
    with gzip.open(str(tmp_path / "direct1.chr.stat.gz")) as fh:
        b = fh.read()
    assert a == b


def test_serve_second_run_and_cwd(served, tmp_path):
    """Requests land in the caller's cwd, and a warm daemon keeps
    serving after the first request."""
    _client(served["env"], ["-i", served["bam"], "-o", "srv2"],
            str(tmp_path))
    assert os.path.exists(str(tmp_path / "srv2.chr.stat.gz"))
    assert served["srv"].poll() is None


def test_serve_propagates_exit_code(served):
    p = _client(served["env"], ["-i", "/nonexistent.bam", "-o", "x"],
                served["dir"], check=False)
    assert p.returncode != 0
    assert "Error" in p.stderr
    assert served["srv"].poll() is None  # daemon survives bad runs


def test_serve_stale_token_refused(served):
    """A client whose code token mismatches gets 'stale' and the
    daemon exits (so a respawn picks up fresh code)."""
    conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    conn.connect(served["sock"])
    payload = {"argv": ["-i", served["bam"], "-o", "nope"],
               "cwd": served["dir"], "token": "0.0", "env": {}}
    socket.send_fds(conn, [json.dumps(payload).encode()],
                    [0, 1, 2])
    conn.shutdown(socket.SHUT_WR)
    buf = conn.recv(65536)
    conn.close()
    assert json.loads(buf.decode()).get("error") == "stale"
    served["srv"].wait(timeout=30)
    # respawn a fresh server for the remaining fixture teardown path
    srv = subprocess.Popen([sys.executable, "-S", LAUNCHER, "--serve"],
                           env=served["env"],
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
    _wait_sock(served["sock"])
    served["srv"] = srv


def test_run_one_env_replacement_and_errors(tmp_path, monkeypatch):
    """_run_one must (a) REPLACE the daemon's PANDEPTH_* env with the
    request's — a var the daemon inherited at spawn but absent from
    the request must not leak into the run; (b) survive a dead cwd and
    a string SystemExit without killing the daemon; (c) restore env
    afterwards."""
    from pandepth_tpu import serve as srv_mod

    s = srv_mod._Server(str(tmp_path / "x.sock"))
    monkeypatch.setenv("PANDEPTH_TEST_INHERITED", "1")

    seen = {}

    def fake_main(argv):
        seen["inherited"] = os.environ.get("PANDEPTH_TEST_INHERITED")
        seen["sent"] = os.environ.get("PANDEPTH_TEST_SENT")
        seen["cwd"] = os.getcwd()
        return 0

    monkeypatch.setattr("pandepth_tpu.cli.main", fake_main)
    fds = [os.open(os.devnull, os.O_RDONLY),
           os.open(os.devnull, os.O_WRONLY),
           os.open(os.devnull, os.O_WRONLY)]
    reply = s._run_one({"argv": ["-h"], "cwd": str(tmp_path),
                        "env": {"PANDEPTH_TEST_SENT": "yes"}}, fds)
    assert reply["rc"] == 0
    assert seen["inherited"] is None      # removed for the run
    assert seen["sent"] == "yes"
    assert os.environ.get("PANDEPTH_TEST_INHERITED") == "1"  # restored
    assert "PANDEPTH_TEST_SENT" not in os.environ

    # dead cwd: rc != 0, no exception escapes
    gone = tmp_path / "gone"
    gone.mkdir()
    gone.rmdir()
    fds = [os.open(os.devnull, os.O_RDONLY),
           os.open(os.devnull, os.O_WRONLY),
           os.open(os.devnull, os.O_WRONLY)]
    reply = s._run_one({"argv": [], "cwd": str(gone), "env": {}}, fds)
    assert reply["rc"] != 0

    # string SystemExit: CPython prints it and exits 1
    def exit_main(argv):
        raise SystemExit("boom")

    monkeypatch.setattr("pandepth_tpu.cli.main", exit_main)
    fds = [os.open(os.devnull, os.O_RDONLY),
           os.open(os.devnull, os.O_WRONLY),
           os.open(os.devnull, os.O_WRONLY)]
    reply = s._run_one({"argv": [], "cwd": str(tmp_path), "env": {}},
                       fds)
    assert reply["rc"] == 1
