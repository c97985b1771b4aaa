"""HostCoverageEngine: the CoverageEngine interface with a pure
host-CPU compute core — IMPORTS NO JAX.

Election (run._want_host_finalize): one-shot COLD CLI processes
feeding a remote-tunneled device. Such a process pays, on its critical
path, ~2.6 s of sitecustomize/jax import CPU, ~1.5 s of PJRT
handshake, and ~2 s of server-side executable load for the fused
finalize program (measured; the feed it could hide behind lasts
~0.5 s). The native host sweep (io/native pancov_host_finalize:
parallel radix sort + one sweep, the C++ twin of device/sweep.py)
answers the same finalize in ~0.2-0.5 s at 3 Gb-bench scale, and a run
through this engine never touches jax at all. The resident daemon
(serve.py) elects by the same link-cost rule — through the tunnel the
wire loses to this sweep even with warm device programs (BENCH_3GB r3:
daemon+device chr 1.79 s vs 0.81 s) — while locally attached backends
and multi-chip/multi-host jobs keep the DEVICE engines: that path is
the production scale-out story; this one makes single-device runs
behind a thin link honest.

Every statistic is byte-identical to the device engine by
construction: both are event sweeps with the same clamping, the same
``Q(hi) - Q(lo)`` prefix-integral evaluation and the same wrap18
semantics (tests/test_host_engine.py proves equality and oracle
parity)."""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from pandepth_tpu.device import hosteval as he
from pandepth_tpu.device.hosteval import SegmentStats
from pandepth_tpu.device.layout import GenomeLayout


class HostCoverageEngine:
    """CoverageEngine-compatible engine; feeds stay host-resident."""

    wants_padded_events = True
    wants_encoded_windows = False
    # _is_writer_rank: a host-engine run is trivially the writer; it
    # must never force a jax backend init at write time (inside a warm
    # daemon init_started() is True, but the PJRT handshake may hang
    # when the tunnel is down — and this engine never needs it)
    jax_free = True

    def __init__(self, layout: GenomeLayout, flags_mask: int = 1796,
                 min_mapq: int = -1, min_dep: int = 1,
                 wrap18: bool = False):
        self.layout = layout
        self.flags_mask = int(flags_mask)
        self.min_mapq = int(min_mapq)
        self.min_dep = max(int(min_dep), 1)
        self.wrap18 = bool(wrap18)
        self.pos_dtype = he.pos_dtype_for(layout.total)
        self.pos_sentinel = int(np.iinfo(self.pos_dtype).max)
        self._stage: List[Tuple[np.ndarray, np.ndarray]] = []
        self._extra: List[Tuple[np.ndarray, np.ndarray]] = []
        self._state: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self._sweep = None  # state + derived prefix integrals
        self.n_reads_seen = 0
        self.keep_state = True

    @property
    def pos_bits32(self) -> bool:
        return self.pos_dtype is not np.int64

    @property
    def pos_sentinel32(self) -> int:
        return int(np.array(self.pos_sentinel,
                            np.uint64).astype(np.uint32).view(np.int32))

    # ----------------------------------------------------------- feeds
    def _dirty(self) -> None:
        self._state = None
        self._sweep = None

    def add_start_end(self, starts: np.ndarray,
                      ends: np.ndarray) -> None:
        if starts.shape[0] == 0:
            return
        self._stage.append(
            (starts.astype(self.pos_dtype, copy=False),
             ends.astype(self.pos_dtype, copy=False)))
        self._dirty()

    add_padded_events = add_start_end

    def add_intervals(self, tid: np.ndarray, start0: np.ndarray,
                      end0: np.ndarray) -> None:
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
        if pos.shape[0] == 0:
            return
        p = np.minimum(pos, self.pos_sentinel).astype(self.pos_dtype,
                                                      copy=False)
        self._extra.append((p, np.asarray(delta, np.int32)))
        self._dirty()

    def add_batch(self, batch) -> None:
        if batch.n_reads == 0:
            return
        self.n_reads_seen += batch.n_reads
        s, e = he.host_extract_events(batch, self.layout.offsets,
                                      self.layout.limits,
                                      self.flags_mask, self.min_mapq)
        self.add_start_end(s, e)

    def add_encoded_window(self, n: int, dd: np.ndarray,
                           ll: np.ndarray, excd: np.ndarray,
                           excl: np.ndarray, base: int) -> None:
        """Safety valve: wants_encoded_windows is False, but a feed
        that produced compact windows anyway decodes host-side."""
        from pandepth_tpu.device.hosteval import decode_enc_host

        s, e = decode_enc_host(dd, ll, excd, excl, base, n)
        self.add_start_end(s, e)

    # run.py warm-up hooks are device-only: nothing to warm here
    def plan_finalize_warmup(self, n_segments: int,
                             want_state: bool) -> None:
        pass

    def maybe_warm_finalize(self, frac: float,
                            pairs_produced: int) -> None:
        pass

    # -------------------------------------------------------- finalize
    def _extras(self):
        if not self._extra:
            return None, None
        return (np.concatenate([p for p, _ in self._extra]),
                np.concatenate([d for _, d in self._extra]))

    def _ensure_state(self):
        if self._state is None:
            xp, xd = self._extras()
            _, _, self._state = he.finalize_events(
                self._stage, xp, xd, self.pos_sentinel,
                np.zeros(1, np.int64), np.ones(1, np.int64),
                self.min_dep, self.wrap18, keep_state=True)
        return self._state

    def _host_sweep(self):
        if self._sweep is None:
            pos_s, depth = self._ensure_state()
            self._sweep = he.derive_integrals(
                pos_s.astype(np.int64, copy=False), depth,
                self.min_dep)
        return self._sweep

    def segment_stats(self, seg_tid: np.ndarray, seg_start: np.ndarray,
                      seg_end: np.ndarray, chunk: int = 1 << 20,
                      keep_state: Optional[bool] = None
                      ) -> SegmentStats:
        keep = self.keep_state if keep_state is None else keep_state
        lo, hi = he.clamp_segments(self.layout, seg_tid, seg_start,
                                   seg_end)
        if self._state is not None:
            sweep = self._host_sweep()
            pos_s = sweep[0]
            qc_lo, qs_lo = he.host_q_eval(
                sweep, self.min_dep, lo,
                np.searchsorted(pos_s, lo, side="left"))
            qc_hi, qs_hi = he.host_q_eval(
                sweep, self.min_dep, hi,
                np.searchsorted(pos_s, hi, side="left"))
            return SegmentStats(cover=qc_hi - qc_lo,
                                depth_sum=qs_hi - qs_lo)
        xp, xd = self._extras()
        cover, dsum, state = he.finalize_events(
            self._stage, xp, xd, self.pos_sentinel, lo, hi,
            self.min_dep, self.wrap18, keep_state=keep)
        if keep:
            self._state = state
        return SegmentStats(cover=cover, depth_sum=dsum)

    def segment_stats_sorted_host(self, seg_tid, seg_start, seg_end
                                  ) -> Optional[SegmentStats]:
        return he.eval_sorted_host(self.layout, self.min_dep,
                                   self._host_sweep(), seg_tid,
                                   seg_start, seg_end)

    def window_stats_host(self, seg_tid, seg_start, seg_end,
                          win: int) -> Optional[SegmentStats]:
        return he.window_grid_host(self.layout, self.min_dep,
                                   self._host_sweep(), seg_tid,
                                   seg_start, seg_end, win)

    def dense_depth(self, tid: int, start0: int = 0,
                    end0: Optional[int] = None) -> np.ndarray:
        lay = self.layout
        if end0 is None:
            end0 = int(lay.lengths[tid])
        pos_s, depth = self._ensure_state()
        return he.dense_from_state(
            pos_s.astype(np.int64, copy=False), depth,
            int(lay.offsets[tid]) + start0,
            int(lay.offsets[tid]) + end0)
