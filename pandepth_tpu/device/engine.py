"""CoverageEngine: batches in, per-segment statistics out.

Single-chip orchestration of the device pipeline:

    ReadBatch --extract_events--> (pos, delta) events   [per batch, jit]
    all events --sort + scan-----> sweep state          [finalize, jit]
    segment boundaries --gather--> CoveredSite/TotalDepth per segment

Replaces the reference's thread-sharded per-base counting engines
(ProDealChrBambai* family, src/PanDepth.cpp:350-801). Multi-sample
accumulation (BamList_main, src/PanDepth.cpp:2029-3410) is free: keep
feeding batches from more files before finalizing.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

from pandepth_tpu import boot as _boot

_boot.configure_jax()  # x64 + cache config must precede jax use

import jax
import jax.numpy as jnp
import numpy as np

from pandepth_tpu.device.events import extract_events, pad_pow2, SENTINEL
from pandepth_tpu.device.layout import GenomeLayout
from pandepth_tpu.device import hosteval as he
# host-side numpy twins shared with the jax-free HostCoverageEngine
# (single implementations live in device/hosteval.py; re-exported here
# for the existing import surface)
from pandepth_tpu.device.hosteval import (SegmentStats,  # noqa: F401
                                          decode_enc_host,
                                          dense_from_state,
                                          pos_dtype_for)
from pandepth_tpu.device import sweep as sweep_mod
from pandepth_tpu.io.bam import ReadBatch


@functools.partial(jax.jit, static_argnames=("sentinel",))
def _pack_events(starts, ends, sentinel: int):
    pos = jnp.concatenate([starts, ends])
    delta = jnp.concatenate([
        (starts < sentinel).astype(jnp.int32),
        -(ends < sentinel).astype(jnp.int32)])
    return pos, delta


def _warm_sig_path() -> Optional[str]:
    # Derive the sidecar path from the SAME platform-conditional
    # default as boot.configure_jax: a CPU-forced run must record warm
    # signatures next to the CPU cache (~/.cache/pandepth_jax_cpu), so
    # wiping that cache after a host migration also drops its sigs
    # instead of leaving stale cpu-platform entries gating warm
    # dispatches against the TPU cache (advisor r4).
    from pandepth_tpu import boot

    d = boot.jax_cache_dir()
    if not d or d == "0":
        return None
    return os.path.join(d, "finalize_signatures.json")


# Bump whenever sweep.finalize_encoded's traced computation or the
# encoded wire format changes: the version rides inside every recorded
# signature, so stale sidecar entries (whose persistent-compile-cache
# executables no longer match) stop gating warm dispatches — a warm-up
# on a vanished cache entry triggers the full server-side compile the
# warm-up exists to avoid.
WARM_SIG_VERSION = 3  # v3: const-length window groups


def _load_warm_sig_list() -> list:
    path = _warm_sig_path()
    if path is None:
        return []
    try:
        import json

        with open(path) as fh:
            return [tuple(s) for s in json.load(fh)]
    except Exception:
        return []


def _load_warm_sigs() -> set:
    return set(_load_warm_sig_list())


def _record_warm_sig(sig: tuple) -> None:
    """Append a finalize signature that REALLY compiled+ran, so later
    processes may warm it (load-only: the persistent compile cache has
    the executable). Best-effort — concurrent writers may drop each
    other's entry; it re-records next run. Eviction is
    insertion-ordered (oldest recorded drops first), never sorted:
    sorting is lexicographic, not recency, and raises on mixed-schema
    tuples."""
    path = _warm_sig_path()
    if path is None:
        return
    try:
        import json

        sigs = _load_warm_sig_list()
        if sigs and sigs[-1] == sig:
            return
        if sig in sigs:
            # refresh recency: the early warm targets the LAST entry
            # and eviction drops the front, so a re-seen signature
            # must move to the end or daily-use shapes lose their
            # warm-up to one-off runs
            sigs.remove(sig)
        sigs.append(sig)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump(sigs[-64:], fh)
        os.replace(tmp, path)
    except Exception:
        pass


@functools.lru_cache(maxsize=8)
def _zero_enc_block(b: int, cap: int, ce: int, dtype=np.uint8):
    """A (B, 2, CAP) all-zero code block (codes[:, 0] = deltas,
    codes[:, 1] = lengths) + its (B, 2, CE) escape block + the
    (B, 2, CE) escape-slot block (all CAP = "unused": slot CAP lands
    in the decode's discard column): decodes to B*CAP zero-length
    events at position 0 — depth-neutral pad for the finalize arity."""
    return (jnp.zeros((b, 2, cap), dtype),
            jnp.zeros((b, 2, ce), jnp.int64),
            jnp.full((b, 2, ce), cap, jnp.int32))


@functools.lru_cache(maxsize=8)
def _zero_encc_block(b: int, cap: int, ce: int, dtype=np.uint8):
    """Const-length twin of _zero_enc_block: a (B, CAP) all-zero
    delta-code block + (B, CE) escape/slot blocks. With n = 0 the
    decode masks every slot's length to zero — depth-neutral."""
    return (jnp.zeros((b, cap), dtype),
            jnp.zeros((b, ce), jnp.int64),
            jnp.full((b, ce), cap, jnp.int32))


class CoverageEngine:
    """Accumulates coverage events for one genome layout."""

    # the device transfer wants sentinel-padded pos_dtype arrays
    # (native loaders produce them with zero host-side copies)
    wants_padded_events = True

    def __init__(self, layout: GenomeLayout, flags_mask: int = 1796,
                 min_mapq: int = -1, min_dep: int = 1,
                 wrap18: bool = False):
        self.layout = layout
        self.flags_mask = int(flags_mask)
        self.min_mapq = int(min_mapq)
        self.min_dep = max(int(min_dep), 1)
        self.wrap18 = bool(wrap18)
        # 32-bit event coordinates halve transfer bytes and sort width
        # whenever the padded genome fits: int32 below 2 Gb, uint32 up
        # to 4 Gb (positions mod 2^32 are exact there, and the zigzag /
        # cumsum decode arithmetic is modular, so truncated-to-32-bit
        # feeds stay bit-exact). int64 only for > 4 Gb genomes.
        self.pos_dtype = pos_dtype_for(layout.total)
        self.pos_sentinel = int(np.iinfo(self.pos_dtype).max)
        self._offsets = jnp.asarray(layout.offsets)
        self._limits = jnp.asarray(layout.limits)
        self._chunks: List[Tuple[jax.Array, jax.Array]] = []
        # host staging for (starts, ends) event arrays: many small
        # device uploads serialize on the dispatch queue (each pays a
        # link round-trip), so windows accumulate here and flush as ONE
        # padded transfer; the threshold bounds host memory
        self._stage: List[Tuple[np.ndarray, np.ndarray]] = []
        self._staged = 0
        self._flush_events = int(os.environ.get(
            "PANDEPTH_FLUSH_EVENTS", 48 << 20))
        self._state = None  # cached sweep state after finalize
        self.n_reads_seen = 0
        # boundary-eval method: on TPU a big query batch rides the fast
        # sort (~20x the serial binary search there), but on the CPU
        # backend the sort re-sorts ALL events with the queries —
        # measured 1.5x whole-run slowdown on a 16M-event mode-5 run —
        # while the unrolled scan is a few vectorized passes either way
        self._is_cpu_backend = jax.devices()[0].platform == "cpu"
        self._eval_sort_ok = not self._is_cpu_backend
        # compact encoded windows (device-resident, uploaded async
        # during the feed; ~2 B/event over the tunnel instead of 8)
        self.enc_cap = int(os.environ.get("PANDEPTH_ENC_CAP", 1 << 19))
        self.enc_exc = int(os.environ.get("PANDEPTH_ENC_EXC", 1 << 13))
        # windows upload in (B, CAP) stacked blocks: every device_put
        # pays a link round-trip (~0.14 s measured through the tunnel
        # for a 512 KB array vs 2.5 s for ONE 32 MB stack), so 4 puts
        # per B windows instead of 4 per window
        self.enc_block = int(os.environ.get("PANDEPTH_ENC_BLOCK", 8))
        # four code groups: mixed uint8 (2 B/pair, deep coverage),
        # mixed uint16 (4 B/pair, sparse coverage), and their
        # CONST-LENGTH variants (1 / 2 B/pair: a window whose event
        # lengths are all equal ships only its delta plane + one
        # scalar length — the fixed-read-length profile). Each group
        # entry is one device-resident stacked block; pending windows
        # stage host-side until a block fills
        self._enc: List[tuple] = []
        self._enc_bases: List[int] = []
        self._enc16: List[tuple] = []
        self._enc16_bases: List[int] = []
        self._pend8: List[tuple] = []
        self._pend8_bases: List[int] = []
        self._pend16: List[tuple] = []
        self._pend16_bases: List[int] = []
        # const-length groups: meta lists carry (base, length, n)
        self._encc8: List[tuple] = []
        self._encc8_meta: List[tuple] = []
        self._encc16: List[tuple] = []
        self._encc16_meta: List[tuple] = []
        self._pendc8: List[tuple] = []
        self._pendc8_meta: List[tuple] = []
        self._pendc16: List[tuple] = []
        self._pendc16_meta: List[tuple] = []
        self._max_enc = 64 * 8  # windows; beyond this, decode on host
        # finalize-program warm-up plan (see plan_finalize_warmup):
        # the fused finalize's first dispatch pays ~2 s of executable
        # load through the tunnel; with the query shape known up front
        # and the encoded-block shapes predictable mid-feed, a
        # background thread runs the same jit call on depth-neutral
        # zero blocks so the real call hits a resident program
        self._warm_plan: Optional[Tuple[int, bool]] = None
        self._warm_shapes: Optional[Tuple[int, int]] = None
        self._warmed_sigs: set = set()
        self._n_win8 = 0
        self._n_win16 = 0
        self._n_winc8 = 0
        self._n_winc16 = 0
        self._last_enc_group = "c8"  # warm predictor's guess for the
        # first windows: uniform-length u8 is the common profile
        self._n_pairs_enc = 0
        # single-query runs (no -a, no later stats pass) skip returning
        # the full sweep state from the fused finalize: through a
        # tunneled TPU that state is hundreds of MB of output handles
        self.keep_state = True

    @property
    def wants_encoded_windows(self) -> bool:
        """Compact ~2 B/event code windows pay off across a narrow
        device link (the tunneled TPU moves ~35 MB/s); on the CPU
        backend there is no link and the fixed-capacity code blocks
        make the XLA sort mostly sentinel padding — raw event staging
        is ~2x faster end-to-end there (measured on the 3 Gb bench:
        gene 7.5 s -> 3.0 s, chr 9.7 s -> 5.5 s). PANDEPTH_ENC=0/1
        overrides."""
        env = os.environ.get("PANDEPTH_ENC")
        if env is not None:
            return env != "0"
        return not self._is_cpu_backend

    @property
    def pos_bits32(self) -> bool:
        """True when positions ride the 32-bit fast path (int32 or
        uint32): the native loaders' truncating int32 stores are
        bit-exact for both (reinterpret via .view(pos_dtype))."""
        return self.pos_dtype is not np.int64

    @property
    def pos_sentinel32(self) -> int:
        """pos_sentinel as the signed-int32 bit pattern the C++ fast
        path writes into its int32 buffers (-1 for the uint32 tier)."""
        return int(np.array(self.pos_sentinel,
                            np.uint64).astype(np.uint32).view(np.int32))

    # ------------------------------------------------------------------
    def add_batch(self, batch: ReadBatch) -> None:
        n = batch.n_reads
        m = batch.n_total_ops
        if n == 0:
            return
        self.n_reads_seen += n
        np_, mp = pad_pow2(n), pad_pow2(max(m, 1))

        def padi(a, size, fill):
            out = np.full(size, fill, np.int32)
            out[: a.shape[0]] = a
            return out

        ev_pos, ev_delta = extract_events(
            jnp.asarray(padi(batch.tid, np_, -1)),
            jnp.asarray(padi(batch.pos, np_, 0)),
            jnp.asarray(padi(batch.flag, np_, 0)),
            jnp.asarray(padi(batch.mapq, np_, 0)),
            jnp.asarray(padi(batch.op_code, mp, 0)),
            jnp.asarray(padi(batch.op_len, mp, 0)),
            jnp.asarray(padi(batch.op_read, mp, n - 1)),
            self._offsets, self._limits,
            flags_mask=self.flags_mask, min_mapq=self.min_mapq)
        if self.pos_dtype is not np.int64:
            # sentinels (1<<62) clamp to the dtype max; real positions
            # fit (mod 2^32 is exact for the uint32 tier)
            ev_pos = jnp.minimum(ev_pos, self.pos_sentinel).astype(
                self.pos_dtype)
        self._chunks.append((ev_pos, ev_delta))
        self._state = None

    def add_start_end(self, starts: np.ndarray, ends: np.ndarray) -> None:
        """Append pre-extracted, pre-filtered global [start, end) event
        pairs (the native C++ fast path). Sentinel-tailed slots are
        fine; deltas are synthesized on-device so only positions cross
        the host->device link."""
        if starts.shape[0] == 0:
            return
        self._stage.append((starts.astype(self.pos_dtype, copy=False),
                            ends.astype(self.pos_dtype, copy=False)))
        self._staged += starts.shape[0]
        self._state = None
        if self._staged >= self._flush_events:
            self._flush_stage()

    # native loaders hand over pos_dtype sentinel-tailed arrays; both
    # shapes stage identically
    add_padded_events = add_start_end

    def _flush_stage(self) -> None:
        """One padded H2D transfer + device pack for all staged pairs."""
        if not self._stage:
            return
        m = sum(s.shape[0] for s, _ in self._stage)
        mp = pad_pow2(m)
        s = np.full(mp, self.pos_sentinel, self.pos_dtype)
        e = np.full(mp, self.pos_sentinel, self.pos_dtype)
        o = 0
        for a, b in self._stage:
            s[o: o + a.shape[0]] = a
            e[o: o + b.shape[0]] = b
            o += a.shape[0]
        self._stage = []
        self._staged = 0
        pos, delta = _pack_events(jnp.asarray(s), jnp.asarray(e),
                                  self.pos_sentinel)
        self._chunks.append((pos, delta))

    def add_encoded_window(self, n: int, dd: np.ndarray,
                           ll: np.ndarray, excd: np.ndarray,
                           excl: np.ndarray, base: int) -> None:
        """Stage one compact-encoded event window (see
        sweep.finalize_encoded for the wire format; uint8 or uint16
        codes by dtype). A window whose lengths are all equal (and
        un-escaped) routes to the CONST-LENGTH group — its length
        plane never crosses the link, halving the window's wire
        bytes. Windows upload in stacked blocks of ``enc_block``; the
        device_put is asynchronous, so transfers overlap later
        windows' decode — by finalize time the events are already
        resident."""
        assert dd.shape[0] == self.enc_cap
        esc = int(np.iinfo(dd.dtype).max)
        ulen = int(ll[0]) if n > 0 else esc
        is_const = ulen != esc and not np.any(ll[:n] != ll[0])
        self._n_pairs_enc += int(n)
        self._state = None
        if is_const:
            if dd.dtype == np.uint8:
                self._n_winc8 += 1
                self._last_enc_group = "c8"
                pend, meta = self._pendc8, self._pendc8_meta
            else:
                self._n_winc16 += 1
                self._last_enc_group = "c16"
                pend, meta = self._pendc16, self._pendc16_meta
            pend.append((dd, excd))
            meta.append((int(base), ulen, int(n)))
            if len(pend) >= self.enc_block:
                self._flush_encc_block(dd.dtype)
        else:
            if dd.dtype == np.uint8:
                self._n_win8 += 1
                self._last_enc_group = "8"
                pend, bases = self._pend8, self._pend8_bases
            else:
                self._n_win16 += 1
                self._last_enc_group = "16"
                pend, bases = self._pend16, self._pend16_bases
            pend.append((dd, ll, excd, excl))
            bases.append(int(base))
            if len(pend) >= self.enc_block:
                self._flush_enc_block(dd.dtype)
        if (len(self._enc) + len(self._enc16) + len(self._encc8)
                + len(self._encc16)) * self.enc_block > self._max_enc:
            self._spill_enc()

    def _flush_enc_block(self, dtype, pad: bool = False) -> None:
        """Stack pending windows into one (B, 2, CAP) code block +
        one (B, 2, CE) escape block and start their (async) uploads —
        TWO device_puts per B windows; every put pays a tunnel
        round-trip. ``pad=True`` zero-fills a partial block (zero
        codes decode depth-neutral) so the finalize signature only
        ever sees full blocks."""
        pend, pbases, group, gbases = \
            (self._pend8, self._pend8_bases, self._enc,
             self._enc_bases) if dtype == np.uint8 else \
            (self._pend16, self._pend16_bases, self._enc16,
             self._enc16_bases)
        b = self.enc_block
        if not pend or (len(pend) < b and not pad):
            return
        k = len(pend)
        esc = int(np.iinfo(dtype).max)
        codes = np.zeros((b, 2, self.enc_cap), dtype)
        excs = np.zeros((b, 2, self.enc_exc), np.int64)
        # escape SLOT indices per row (device decode applies escapes
        # as a tiny scatter instead of a per-element gather); unused
        # entries point at CAP = the decode's discard column
        slots = np.full((b, 2, self.enc_exc), self.enc_cap, np.int32)
        for i, (dd, ll, excd, excl) in enumerate(pend):
            codes[i, 0] = dd
            codes[i, 1] = ll
            excs[i, 0] = excd
            excs[i, 1] = excl
            fd = np.flatnonzero(dd == esc)
            fl = np.flatnonzero(ll == esc)
            slots[i, 0, : fd.shape[0]] = fd
            slots[i, 1, : fl.shape[0]] = fl
        group.append((jax.device_put(codes), jax.device_put(excs),
                      jax.device_put(slots)))
        gbases.extend(pbases + [0] * (b - k))
        pend.clear()
        pbases.clear()

    def _flush_encc_block(self, dtype, pad: bool = False) -> None:
        """Const-length twin of _flush_enc_block: stack pending
        windows into one (B, CAP) delta-code block + (B, CE)
        escape/slot blocks and start their (async) uploads. Each
        window's (base, length, n) meta stays host-side and rides the
        finalize call as three small vectors."""
        pend, pmeta, group, gmeta = \
            (self._pendc8, self._pendc8_meta, self._encc8,
             self._encc8_meta) if dtype == np.uint8 else \
            (self._pendc16, self._pendc16_meta, self._encc16,
             self._encc16_meta)
        b = self.enc_block
        if not pend or (len(pend) < b and not pad):
            return
        k = len(pend)
        esc = int(np.iinfo(dtype).max)
        codes = np.zeros((b, self.enc_cap), dtype)
        excs = np.zeros((b, self.enc_exc), np.int64)
        slots = np.full((b, self.enc_exc), self.enc_cap, np.int32)
        for i, (dd, excd) in enumerate(pend):
            codes[i] = dd
            excs[i] = excd
            fd = np.flatnonzero(dd == esc)
            slots[i, : fd.shape[0]] = fd
        group.append((jax.device_put(codes), jax.device_put(excs),
                      jax.device_put(slots)))
        gmeta.extend(pmeta + [(0, 0, 0)] * (b - k))
        pend.clear()
        pmeta.clear()

    def _spill_enc(self) -> None:
        """Degenerate feeds (thousands of short windows, e.g. an
        unsorted BAM forced down the enc path) fold back into the raw
        staging so the finalize signature stays bounded."""
        for group, bases, pend, pbases in (
                (self._enc, self._enc_bases, self._pend8,
                 self._pend8_bases),
                (self._enc16, self._enc16_bases, self._pend16,
                 self._pend16_bases)):
            for bi, (codes, excs, _slots) in enumerate(group):
                codes = np.asarray(codes)
                excs = np.asarray(excs)
                for row in range(codes.shape[0]):
                    s, e = decode_enc_host(
                        codes[row, 0], codes[row, 1], excs[row, 0],
                        excs[row, 1],
                        bases[bi * self.enc_block + row])
                    self.add_start_end(s, e)
            for (dd, ll, excd, excl), base in zip(pend, pbases):
                s, e = decode_enc_host(dd, ll, excd, excl, base)
                self.add_start_end(s, e)
            group.clear()
            bases.clear()
            pend.clear()
            pbases.clear()
        ez = np.zeros(self.enc_exc, np.int64)
        for group, gmeta, pend, pmeta, dtype in (
                (self._encc8, self._encc8_meta, self._pendc8,
                 self._pendc8_meta, np.uint8),
                (self._encc16, self._encc16_meta, self._pendc16,
                 self._pendc16_meta, np.uint16)):

            def spill_one(dd, excd, base, ulen, n):
                # reconstruct the length plane the const route dropped
                # (a const window's inline length always fits the code
                # dtype — an escaped length would have routed mixed)
                ll = np.zeros(dd.shape[0], dtype)
                ll[:n] = ulen
                s, e = decode_enc_host(dd, ll, excd, ez, base, n)
                self.add_start_end(s, e)

            for bi, (codes, excs, _slots) in enumerate(group):
                codes = np.asarray(codes)
                excs = np.asarray(excs)
                for row in range(codes.shape[0]):
                    base, ulen, n = gmeta[bi * self.enc_block + row]
                    spill_one(codes[row], excs[row], base, ulen, n)
            for (dd, excd), (base, ulen, n) in zip(pend, pmeta):
                spill_one(dd, excd, base, ulen, n)
            group.clear()
            gmeta.clear()
            pend.clear()
            pmeta.clear()

    @property
    def _has_enc(self) -> bool:
        return bool(self._enc or self._enc16 or self._pend8
                    or self._pend16 or self._encc8 or self._encc16
                    or self._pendc8 or self._pendc16)

    def _clear_enc(self) -> None:
        self._enc = []
        self._enc_bases = []
        self._enc16 = []
        self._enc16_bases = []
        self._encc8 = []
        self._encc8_meta = []
        self._encc16 = []
        self._encc16_meta = []

    def _enc_group_args(self, group, bases_list, dtype):
        k = len(group)
        if k == 0:
            # an unused code-width group contributes a TINY depth-
            # neutral block, not a full-capacity zero block: the zero
            # codes still ride the finalize sort, and a (B, 2, CAP)
            # zero block would double it (measured 269 -> 148 ms on
            # the 8.4M-event bench finalize)
            zc, ze, zs = _zero_enc_block(1, 1, 1, dtype)
            return (zc,), (ze,), (zs,), jnp.zeros(1, self.pos_dtype)
        kp = pad_pow2(k, floor=1)
        z = _zero_enc_block(self.enc_block, self.enc_cap,
                            self.enc_exc, dtype)
        blocks = list(group) + [z] * (kp - k)
        # bases pin the decode dtype: int32 positions whenever the
        # padded genome fits (halves the device sort width)
        bases = np.zeros(kp * self.enc_block, self.pos_dtype)
        bases[:len(bases_list)] = bases_list
        return (tuple(w[0] for w in blocks),
                tuple(w[1] for w in blocks),
                tuple(w[2] for w in blocks),
                jnp.asarray(bases))

    def _encc_group_args(self, group, meta, dtype):
        k = len(group)
        if k == 0:
            zc, ze, zs = _zero_encc_block(1, 1, 1, dtype)
            return ((zc,), (ze,), (zs,),
                    jnp.zeros(1, self.pos_dtype),
                    jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
        kp = pad_pow2(k, floor=1)
        z = _zero_encc_block(self.enc_block, self.enc_cap,
                             self.enc_exc, dtype)
        blocks = list(group) + [z] * (kp - k)
        nrow = kp * self.enc_block
        bases = np.zeros(nrow, self.pos_dtype)
        lens = np.zeros(nrow, np.int32)
        ns = np.zeros(nrow, np.int32)
        for i, (b, ln, n) in enumerate(meta):
            bases[i] = b
            lens[i] = ln
            ns[i] = n
        return (tuple(w[0] for w in blocks),
                tuple(w[1] for w in blocks),
                tuple(w[2] for w in blocks),
                jnp.asarray(bases), jnp.asarray(lens),
                jnp.asarray(ns))

    def _enc_args(self):
        """All four code groups: flush partial pending blocks
        (zero-padded), then pad block counts to pow2 with cached zero
        blocks (zero codes decode to zero-length events —
        depth-neutral)."""
        self._flush_enc_block(np.uint8, pad=True)
        self._flush_enc_block(np.uint16, pad=True)
        self._flush_encc_block(np.uint8, pad=True)
        self._flush_encc_block(np.uint16, pad=True)
        return (self._enc_group_args(self._enc, self._enc_bases,
                                     np.uint8),
                self._enc_group_args(self._enc16, self._enc16_bases,
                                     np.uint16),
                self._encc_group_args(self._encc8, self._encc8_meta,
                                      np.uint8),
                self._encc_group_args(self._encc16, self._encc16_meta,
                                      np.uint16))

    def plan_finalize_warmup(self, n_segments: int,
                             want_state: bool) -> None:
        """Arm the finalize-program warm-up for this run.

        The fused finalize compiles per shape signature; through the
        tunneled TPU its FIRST dispatch pays ~2 s of executable
        load/warm-up on top of steady-state execution (measured: first
        exec 2.1 s vs 0.41 s after). The query-side shape (padded
        segment count) is known right after target parsing; the
        encoded-block shapes become predictable mid-feed from the
        producer's compressed-byte progress. maybe_warm_finalize()
        then runs the SAME jit call on depth-neutral zero blocks in a
        background thread, overlapped with the rest of the feed, so
        the real dispatch finds a resident program."""
        if self._is_cpu_backend or n_segments > (1 << 20) \
                or os.environ.get("PANDEPTH_WARM") == "0":
            return  # host-grid / chunked paths don't take the fused
            # finalize (run.py routes >1M synthesized windows to
            # window_stats_host; >1M real segments chunk the eval)
        self._warm_plan = (pad_pow2(int(n_segments), floor=256),
                           bool(want_state))
        # EARLY WARM. The cold dispatch pays ~0.8 s of Python tracing
        # plus ~1.3 s of server-side executable load through the
        # tunnel, while a fast feed lasts only tenths of a second —
        # waiting for the 25%-progress predictor leaves most of that
        # serial. Encoded-block shapes repeat across runs on the same
        # workload, so warm the most recent sidecar signature whose
        # run-shape half (bp/method/filters/caps) matches this plan
        # RIGHT NOW, before the feed starts. A stale guess wastes one
        # background dispatch of an already-compiled program; the
        # predictor can still fire a corrective warm mid-feed.
        want = self._finalize_sig(0, 0, 0, 0)
        for sig in reversed(_load_warm_sig_list()):
            if len(sig) == len(want) and sig[:2] == want[:2] \
                    and sig[6:] == want[6:]:
                if os.environ.get("PANDEPTH_WARM_DEBUG"):
                    import sys

                    print(f"[warm] early k={sig[2:6]} "
                          f"bp={want[6]}", file=sys.stderr)
                self._spawn_warm(*(int(x) for x in sig[2:6]))
                break

    def maybe_warm_finalize(self, frac: float,
                            pairs_produced: int) -> None:
        """Predict the finalize's encoded-block shapes from PRODUCER
        progress — ``frac`` compressed bytes consumed / total and the
        event pairs produced so far, a consistent ratio even while the
        producer runs ahead of the consumer — and warm-compile ONCE.
        A misprediction wastes one background dispatch; it never
        changes results (the zero blocks are depth-neutral and the
        real call compiles its own shapes as before)."""
        if self._warm_plan is None or self._warm_shapes is not None \
                or not (0.25 <= frac <= 0.98) or pairs_produced <= 0:
            return
        est_total = pairs_produced / frac
        # remaining CONSUMER windows: total pairs minus those already
        # packed into windows; they land in the group of the LAST
        # routed window (the tier only upgrades u8 -> u16 and const-
        # ness is a property of the input's length profile, so the
        # most recent routing is the best single predictor)
        est_rem = max(est_total - self._n_pairs_enc, 0.0)
        rem_wins = int(np.ceil(est_rem / self.enc_cap))
        wins = {"8": self._n_win8, "16": self._n_win16,
                "c8": self._n_winc8, "c16": self._n_winc16}
        wins[self._last_enc_group] += rem_wins
        b = self.enc_block

        def kp(w: int) -> int:
            if w <= 0:
                return 0
            return pad_pow2((w + b - 1) // b, floor=1)

        self._warm_shapes = (kp(wins["8"]), kp(wins["16"]),
                             kp(wins["c8"]), kp(wins["c16"]))
        # only warm signatures that ALREADY compiled+ran on this host
        # (recorded by segment_stats): a warm-up must only ever
        # pre-load a persistent-cache executable. A mispredicted FRESH
        # signature would start a full server-side compile (tens of
        # seconds on the tunneled TPU) that the real dispatch then
        # queues behind — worse than no warm-up at all.
        known = self._finalize_sig(*self._warm_shapes) in \
            _load_warm_sigs()
        if os.environ.get("PANDEPTH_WARM_DEBUG"):
            import sys
            print(f"[warm] frac={frac:.3f} pairs={pairs_produced} "
                  f"est_total={est_total:.0f} k={self._warm_shapes} "
                  f"bp={self._warm_plan[0]} "
                  f"known={known}", file=sys.stderr)
        if not known:
            return
        self._spawn_warm(*self._warm_shapes)

    def _spawn_warm(self, k8p: int, k16p: int, kc8p: int = 0,
                    kc16p: int = 0) -> None:
        """Background-dispatch one finalize program per distinct known
        signature per run (the early warm and the mid-feed predictor
        may disagree; each warms at most once)."""
        sig = self._finalize_sig(k8p, k16p, kc8p, kc16p)
        if sig in self._warmed_sigs:
            return
        self._warmed_sigs.add(sig)
        import threading

        t = threading.Thread(target=self._warm_finalize,
                             args=(k8p, k16p, kc8p, kc16p),
                             daemon=True)
        self._warm_thread_obj = t
        t.start()

    def _sig_tuple(self, k8p: int, k16p: int, kc8p: int, kc16p: int,
                   bp: int, method: str, want_state: bool) -> tuple:
        """The ONE constructor for finalize signatures — predictor,
        recorder and warm dispatch all go through it so they can never
        drift apart."""
        return (WARM_SIG_VERSION, jax.devices()[0].platform,
                k8p, k16p, kc8p, kc16p,
                bp, method, bool(want_state), self.min_dep,
                bool(self.wrap18), np.dtype(self.pos_dtype).name,
                self.enc_cap, self.enc_exc, self.enc_block)

    def _finalize_sig(self, k8p: int, k16p: int, kc8p: int,
                      kc16p: int) -> tuple:
        bp, want_state = self._warm_plan
        method = "scan_unrolled" if bp <= 4096 \
            or not self._eval_sort_ok else "sort"
        return self._sig_tuple(k8p, k16p, kc8p, kc16p, bp, method,
                               want_state)

    def _warm_finalize(self, k8p: int, k16p: int, kc8p: int,
                       kc16p: int) -> None:
        try:
            bp, want_state = self._warm_plan
            method = "scan_unrolled" if bp <= 4096 \
                or not self._eval_sort_ok else "sort"

            def group(k: int, dtype):
                if k <= 0:
                    zc, ze, zs = _zero_enc_block(1, 1, 1, dtype)
                    return ((zc,), (ze,), (zs,),
                            jnp.zeros(1, self.pos_dtype))
                z = _zero_enc_block(self.enc_block, self.enc_cap,
                                    self.enc_exc, dtype)
                return ((z[0],) * k, (z[1],) * k, (z[2],) * k,
                        jnp.zeros(k * self.enc_block, self.pos_dtype))

            def cgroup(k: int, dtype):
                if k <= 0:
                    zc, ze, zs = _zero_encc_block(1, 1, 1, dtype)
                    return ((zc,), (ze,), (zs,),
                            jnp.zeros(1, self.pos_dtype),
                            jnp.zeros(1, jnp.int32),
                            jnp.zeros(1, jnp.int32))
                z = _zero_encc_block(self.enc_block, self.enc_cap,
                                     self.enc_exc, dtype)
                nrow = k * self.enc_block
                return ((z[0],) * k, (z[1],) * k, (z[2],) * k,
                        jnp.zeros(nrow, self.pos_dtype),
                        jnp.zeros(nrow, jnp.int32),
                        jnp.zeros(nrow, jnp.int32))

            g8 = group(k8p, np.uint8)
            g16 = group(k16p, np.uint16)
            gc8 = cgroup(kc8p, np.uint8)
            gc16 = cgroup(kc16p, np.uint16)
            cp = (jnp.full((1,), self.pos_sentinel, self.pos_dtype),)
            cd = (jnp.zeros((1,), jnp.int32),)
            lo = jnp.zeros(bp, self.pos_dtype)
            hi = jnp.zeros(bp, self.pos_dtype)
            sweep_mod.finalize_encoded(
                g8, g16, gc8, gc16, cp, cd, lo, hi,
                min_dep=self.min_dep,
                wrap18=self.wrap18, method=method,
                want_state=want_state)
        except Exception:
            pass  # best-effort: the real dispatch compiles as before

    def add_intervals(self, tid: np.ndarray, start0: np.ndarray,
                      end0: np.ndarray) -> None:
        """Append depth +1 over 0-based half-open [start0, end0) intervals
        (PAF / CRAM batch path). Clamped into each contig's padded
        range. Rides the staging path: per-batch padded chunks (one
        per CRAM slice, ~200 on a 2M-read file) would each become a
        separate finalize operand — a fresh jit signature per batch
        count and a 200-array concat."""
        if tid.shape[0] == 0:
            return
        lay = self.layout
        floor = lay.offsets[tid]
        limit = lay.limits[tid]
        s = np.clip(floor + start0, floor, limit)
        e = np.clip(floor + end0, floor, limit)
        live = e > s
        self.add_start_end(s[live], e[live])

    def add_events(self, pos: np.ndarray, delta: np.ndarray) -> None:
        """Directly append pre-built events (PAF path, tests).
        Out-of-dtype positions (int64 SENTINEL) clamp to the sentinel."""
        if pos.shape[0] == 0:
            return
        m = pad_pow2(pos.shape[0])
        p = np.full(m, self.pos_sentinel, self.pos_dtype)
        d = np.zeros(m, np.int32)
        p[: pos.shape[0]] = np.minimum(pos, self.pos_sentinel)
        d[: delta.shape[0]] = delta
        self._chunks.append((jnp.asarray(p), jnp.asarray(d)))
        self._state = None

    # ------------------------------------------------------------------
    def _events(self) -> Tuple[jax.Array, jax.Array]:
        self._flush_stage()
        if not self._chunks:
            z = jnp.full((1,), self.pos_sentinel, self.pos_dtype)
            return z, jnp.zeros((1,), jnp.int32)
        pos = jnp.concatenate([c[0] for c in self._chunks])
        delta = jnp.concatenate([c[1] for c in self._chunks])
        # pad the total to a power of two: keeps the sort/scan jit cache
        # to O(log E) distinct shapes
        e = pos.shape[0]
        ep = pad_pow2(e)
        if ep != e:
            pos = jnp.concatenate(
                [pos, jnp.full((ep - e,), self.pos_sentinel,
                               self.pos_dtype)])
            delta = jnp.concatenate(
                [delta, jnp.zeros((ep - e,), jnp.int32)])
        return pos, delta

    def sweep_state(self):
        """(pos_sorted, depth, c_cov, c_sum); cached until new events."""
        if self._state is None:
            if self._has_enc:
                # ride the fused encoded finalize with a dummy query
                # (forcing keep_state: this call exists to build it)
                self.segment_stats(np.zeros(1, np.int64),
                                   np.ones(1, np.int64),
                                   np.ones(1, np.int64),
                                   keep_state=True)
                return self._state
            pos, delta = self._events()
            full = sweep_mod.sort_events(
                pos, delta, min_dep=self.min_dep, wrap18=self.wrap18)
            # keep only the sorted events (later adds re-merge cheaply)
            self._chunks = [(full[0], full[4])]
            self._state = full[:4]
        return self._state

    def segment_stats(self, seg_tid: np.ndarray, seg_start: np.ndarray,
                      seg_end: np.ndarray,
                      chunk: int = 1 << 20,
                      keep_state: Optional[bool] = None) -> SegmentStats:
        """Stats for 1-based inclusive [seg_start, seg_end] segments.

        Boundaries are clamped into each contig's padded range exactly
        like the depth writes are, so a BED region overhanging a contig
        reads the same slack cells the reference's arrays expose.

        ``keep_state`` overrides ``self.keep_state`` for this call;
        with state-keeping off, the fused finalize returns only the
        per-segment answers and leaves the feeds intact (a later query
        re-finalizes — correct, just one extra dispatch).
        """
        keep = self.keep_state if keep_state is None else keep_state
        lay = self.layout
        lo = lay.offsets[seg_tid] + np.maximum(seg_start - 1, 0)
        hi = lay.offsets[seg_tid] + np.asarray(seg_end, np.int64)
        lo = np.minimum(lo, lay.limits[seg_tid])
        hi = np.minimum(hi, lay.limits[seg_tid])
        hi = np.maximum(hi, lo)

        b = lo.shape[0]
        dbg = os.environ.get("PANDEPTH_SEG_DEBUG")
        if dbg:
            import time as _time

            _t0 = _time.perf_counter()
        if self._state is None and b <= chunk:
            # one fused dispatch: concat + sort + scan + eval; cache
            # the state
            bp = pad_pow2(b, floor=256)
            lo_c = np.zeros(bp, self.pos_dtype)
            hi_c = np.zeros(bp, self.pos_dtype)
            lo_c[:b] = lo
            hi_c[:b] = hi
            method = "scan_unrolled" if bp <= 4096 or not self._eval_sort_ok else "sort"
            self._flush_stage()
            if dbg:
                _t1 = _time.perf_counter()
            if self._chunks:
                cp = tuple(c[0] for c in self._chunks)
                cd = tuple(c[1] for c in self._chunks)
            else:
                cp = (jnp.full((1,), self.pos_sentinel,
                               self.pos_dtype),)
                cd = (jnp.zeros((1,), jnp.int32),)
            if self._has_enc:
                g8, g16, gc8, gc16 = self._enc_args()
                out = sweep_mod.finalize_encoded(
                    g8, g16, gc8, gc16, cp, cd,
                    jnp.asarray(lo_c), jnp.asarray(hi_c),
                    min_dep=self.min_dep, wrap18=self.wrap18,
                    method=method, want_state=keep)
                if not self._chunks:
                    # remember this signature so later processes may
                    # warm-load it during their feed (maybe_warm_...)
                    def kp_of(group):
                        return pad_pow2(len(group), floor=1) \
                            if group else 0

                    _record_warm_sig(self._sig_tuple(
                        kp_of(self._enc), kp_of(self._enc16),
                        kp_of(self._encc8), kp_of(self._encc16),
                        bp, method, keep))
                if keep:
                    self._clear_enc()
            else:
                out = sweep_mod.finalize_chunked(
                    cp, cd, jnp.asarray(lo_c), jnp.asarray(hi_c),
                    min_dep=self.min_dep, wrap18=self.wrap18,
                    method=method, want_state=keep)
            cover, dsum = out[0], out[1]
            if keep:
                self._state = out[2:6]
                self._chunks = [(out[2], out[6])]
            if dbg:
                import sys as _sys

                _t2 = _time.perf_counter()
                c_np = np.asarray(cover)[:b]
                d_np = np.asarray(dsum)[:b]
                _t3 = _time.perf_counter()
                print(f"[seg] b={b} bp={bp} method={method} "
                      f"k8={len(self._enc)} k16={len(self._enc16)} "
                      f"kc8={len(self._encc8)} "
                      f"kc16={len(self._encc16)} "
                      f"pairs={self._n_pairs_enc} "
                      f"flush={_t1 - _t0:.3f}s "
                      f"dispatch={_t2 - _t1:.3f}s "
                      f"fetch={_t3 - _t2:.3f}s", file=_sys.stderr)
                if dbg == "2" and not keep and self._has_enc:
                    # steady state: same signature, no retrace
                    _r0 = _time.perf_counter()
                    out2 = sweep_mod.finalize_encoded(
                        g8, g16, gc8, gc16, cp, cd, jnp.asarray(lo_c),
                        jnp.asarray(hi_c), min_dep=self.min_dep,
                        wrap18=self.wrap18, method=method,
                        want_state=keep)
                    _r1 = _time.perf_counter()
                    np.asarray(out2[0])
                    _r2 = _time.perf_counter()
                    print(f"[seg2] dispatch={_r1 - _r0:.3f}s "
                          f"fetch={_r2 - _r1:.3f}s", file=_sys.stderr)
                return SegmentStats(cover=c_np, depth_sum=d_np)
            return SegmentStats(cover=np.asarray(cover)[:b],
                                depth_sum=np.asarray(dsum)[:b])

        pos_s, depth, c_cov, c_sum = self.sweep_state()
        md = jnp.int32(self.min_dep)
        cover = np.empty(b, np.int64)
        dsum = np.empty(b, np.int64)
        for i in range(0, b, chunk):
            j = min(i + chunk, b)
            bp = pad_pow2(j - i, floor=256)
            lo_c = np.zeros(bp, self.pos_dtype)
            hi_c = np.zeros(bp, self.pos_dtype)
            lo_c[: j - i] = lo[i:j]
            hi_c[: j - i] = hi[i:j]
            # few queries -> binary search; many -> ride the TPU sort
            method = "scan_unrolled" if bp <= 4096 or not self._eval_sort_ok else "sort"
            qc, qs = sweep_mod.eval_pair(
                pos_s, depth, c_cov, c_sum, md, jnp.asarray(lo_c),
                jnp.asarray(hi_c), method=method)
            cover[i:j] = np.asarray(qc)[: j - i]
            dsum[i:j] = np.asarray(qs)[: j - i]
        return SegmentStats(cover=cover, depth_sum=dsum)

    def segment_stats_sorted_host(self, seg_tid: np.ndarray,
                                  seg_start: np.ndarray,
                                  seg_end: np.ndarray
                                  ) -> Optional[SegmentStats]:
        """segment_stats for a batch whose GLOBAL boundaries arrive
        sorted non-decreasing (returns None otherwise — the caller
        falls back to the generic device eval); delegates to the
        shared host eval (hosteval.eval_sorted_host). A 3 Gb genome at
        ``-w 100`` is ~30 M windows; the chunked device path pays ~30
        padded sort dispatches (and, through a tunneled TPU, ~0.5 GB
        of boundary uploads) where this pays one state fetch that
        mode 6 already needs for its second stats pass."""
        return he.eval_sorted_host(self.layout, self.min_dep,
                                   self._host_sweep(), seg_tid,
                                   seg_start, seg_end)

    def _host_sweep(self):
        """(pos_s int64, depth, c_cov, c_sum) as host numpy arrays.

        Prefix integrals are re-derived on host (hosteval): fetching
        c_cov/c_sum from the device would double the device->host
        bytes for no work saved. Cached keyed on the device state
        object — the per-contig mode-6 streaming writer calls this
        once per contig and must not re-fetch ~130 MB of breakpoints
        through the tunnel each time."""
        st = self.sweep_state()
        cached = getattr(self, "_hsweep_cache", None)
        if cached is not None and cached[0] is st[0]:
            return cached[1]
        pos_s = np.asarray(st[0]).astype(np.int64, copy=False)
        depth = np.asarray(st[1])
        sweep = he.derive_integrals(pos_s, depth, self.min_dep)
        self._hsweep_cache = (st[0], sweep)
        return sweep

    def _host_q_eval(self, sweep, x: np.ndarray, r: np.ndarray):
        return he.host_q_eval(sweep, self.min_dep, x, r)

    def window_stats_host(self, seg_tid: np.ndarray,
                          seg_start: np.ndarray, seg_end: np.ndarray,
                          win: int) -> Optional[SegmentStats]:
        """Window stats for a regular tiling, or None when the batch
        isn't one (caller falls back to the generic eval); the O(E)
        piece-scatter grid eval is shared with the host engine
        (hosteval.window_grid_host)."""
        return he.window_grid_host(self.layout, self.min_dep,
                                   self._host_sweep(), seg_tid,
                                   seg_start, seg_end, win)

    def dense_depth(self, tid: int, start0: int = 0,
                    end0: Optional[int] = None) -> np.ndarray:
        """Per-base depth for one contig (0-based half-open range)."""
        lay = self.layout
        if end0 is None:
            end0 = int(lay.lengths[tid])
        lo = int(lay.offsets[tid]) + start0
        hi = int(lay.offsets[tid]) + end0
        pos_s, depth, _, _ = self.sweep_state()
        return dense_from_state(np.asarray(pos_s), np.asarray(depth),
                                lo, hi)
