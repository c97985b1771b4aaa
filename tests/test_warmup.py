"""Finalize-program warm-up: shape prediction, the signature sidecar
gate, and the native stream's progress estimate.

The warm-up itself only matters on an accelerator backend (the suite
runs on CPU where the engine disarms it), so these tests drive the
planning/prediction pieces directly with synthetic counters."""

import json
import os

import numpy as np
import pytest

from pandepth_tpu.device.engine import (CoverageEngine,
                                        _load_warm_sigs,
                                        _record_warm_sig)
from pandepth_tpu.device.layout import GenomeLayout

from tests.fixtures import make_bam


@pytest.fixture
def sig_sidecar(tmp_path, monkeypatch):
    monkeypatch.setenv("PANDEPTH_JAX_CACHE", str(tmp_path / "jc"))
    return tmp_path / "jc" / "finalize_signatures.json"


def _armed_engine():
    eng = CoverageEngine(GenomeLayout(np.array([1_000_000])))
    # the suite runs on the CPU backend where plan_finalize_warmup
    # correctly disarms; force the accelerator-side planning path
    eng._is_cpu_backend = False
    eng._eval_sort_ok = True
    eng.plan_finalize_warmup(100_000, want_state=False)
    assert eng._warm_plan == (131072, False)
    return eng


def test_sidecar_roundtrip(sig_sidecar):
    sig = ("tpu", 1, 2, 512, "scan_unrolled", False, 1, False,
           "uint32", 1 << 19, 1 << 13, 8)
    assert sig not in _load_warm_sigs()
    _record_warm_sig(sig)
    assert sig in _load_warm_sigs()
    _record_warm_sig(sig)  # idempotent
    with open(sig_sidecar) as fh:
        assert len(json.load(fh)) == 1


def test_unknown_signature_never_warms(sig_sidecar, monkeypatch):
    eng = _armed_engine()
    fired = []
    monkeypatch.setattr(CoverageEngine, "_warm_finalize",
                        lambda self, *a: fired.append(a))
    eng._n_win8, eng._n_pairs_enc = 2, 2 * eng.enc_cap
    eng.maybe_warm_finalize(0.5, 2 * eng.enc_cap)
    assert fired == []               # sidecar empty: must not compile
    assert eng._warm_shapes == (1, 0)  # one attempt, then latched


def test_known_signature_warms_once(sig_sidecar, monkeypatch):
    eng = _armed_engine()
    fired = []
    monkeypatch.setattr(CoverageEngine, "_warm_finalize",
                        lambda self, *a: fired.append(a))
    # 2 of an estimated 4 windows seen at frac 0.5 -> 4 u8 windows
    # -> 1 block -> k8p=1, k16p=0
    eng._n_win8, eng._n_pairs_enc = 2, 2 * eng.enc_cap
    _record_warm_sig(eng._finalize_sig(1, 0))
    eng.maybe_warm_finalize(0.5, 2 * eng.enc_cap)
    eng.maybe_warm_finalize(0.6, 3 * eng.enc_cap)  # latched: no re-fire
    import time

    t = eng._warm_thread_obj
    t.join(5)
    assert fired == [(1, 0)]


def test_tier_upgrade_predicts_u16(sig_sidecar, monkeypatch):
    eng = _armed_engine()
    fired = []
    monkeypatch.setattr(CoverageEngine, "_warm_finalize",
                        lambda self, *a: fired.append(a))
    # one short u8 window then a full u16 window, 25% through: the
    # remaining ~22 windows arrive at the u16 tier -> 23 u16 windows
    # -> 3 blocks -> k16p padded to 4
    eng._n_win8, eng._n_win16 = 1, 1
    eng._n_pairs_enc = 3 * eng.enc_cap
    _record_warm_sig(eng._finalize_sig(1, 4))
    eng.maybe_warm_finalize(0.25, 3 * eng.enc_cap)
    eng._warm_thread_obj.join(5)
    assert fired == [(1, 4)]


def test_stream_progress_monotone(tmp_path):
    from pandepth_tpu.io.native import NativeBamStream, load_library

    if load_library() is None:
        pytest.skip("native library unavailable")
    bam = str(tmp_path / "p.bam")
    make_bam(bam, n=4000, seed=11)
    s = NativeBamStream(bam, 1796, -1)
    prev_frac, prev_pairs = 0.0, 0
    while True:
        n = s.wait()
        if n < 0:
            break
        frac, pairs = s.progress()
        assert 0.0 <= frac <= 1.0
        assert frac >= prev_frac and pairs >= prev_pairs
        prev_frac, prev_pairs = frac, pairs
        if n > 0:
            s.take64(n)
        else:
            s.take64(0)
    assert prev_frac == 1.0
    assert prev_pairs > 0
    s.close()
