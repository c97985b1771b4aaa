"""Pallas GC base-count kernel.

GC(%) columns need per-region G/C counts over the reference sequence
(reference: scalar byte loop ``GCGCArry[RefBase[chr][i]]``,
src/PanDepth.cpp:947-949, :3607-3612). The device path packs the
sequence to ONE bit per base on the host (1 = G/C/g/c — 8x less
transfer than bytes), a Pallas kernel popcounts each 32-base word on
the VPU, and region counts become prefix-sum differences plus masked
popcounts of the two edge words — the same boundary-gather shape as
the depth sweep, so a 3 Gb genome costs ~100 MB of HBM traffic instead
of a host byte loop.

`gc_count_ranges_device` must agree bit-for-bit with the numpy
reference implementation (io/fasta.gc_count_ranges); CPU tests run the
kernel in Pallas interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

LANE = 128
ROWS = 256
TILE_WORDS = ROWS * LANE  # int32 words per grid step (128 KiB block)


def pack_gc_bits(seq: bytes) -> np.ndarray:
    """1 bit per base (1 = G/C/g/c); bit i of word w covers base
    w*32+i. Zero-padded to a whole word count."""
    arr = np.frombuffer(seq, np.uint8)
    is_gc = ((arr == ord("G")) | (arr == ord("g")) |
             (arr == ord("C")) | (arr == ord("c")))
    nbits = ((len(seq) + 31) // 32) * 32
    bits = np.zeros(nbits, np.uint8)
    bits[: len(seq)] = is_gc
    # little-endian bit order within each 32-bit word
    words = np.packbits(bits.reshape(-1, 32), axis=1, bitorder="little")
    return words.view(np.uint32).reshape(-1).astype(np.int32)


def _popcount32(x):
    """SWAR popcount on int32 lanes (VPU-friendly)."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return ((x * 0x01010101) >> 24) & 0xFF


def _popcount_kernel(words_ref, out_ref):
    out_ref[...] = _popcount32(words_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def word_popcounts(words, interpret: bool = False):
    """Per-32-base-word GC counts. words: (n,) int32, n % TILE_WORDS
    == 0."""
    n_words = words.shape[0]
    n_tiles = n_words // TILE_WORDS
    w2 = words.reshape(n_tiles * ROWS, LANE)
    out = pl.pallas_call(
        _popcount_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((ROWS, LANE), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((ROWS, LANE), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles * ROWS, LANE),
                                       jnp.int32),
        interpret=interpret,
    )(w2)
    return out.reshape(n_words)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gc_eval(words, starts, ends, interpret: bool = False):
    counts = word_popcounts(words, interpret=interpret)
    pref = jnp.concatenate([jnp.zeros(1, jnp.int64),
                            jnp.cumsum(counts, dtype=jnp.int64)])
    nw = words.shape[0]

    def partial_count(pos):  # GC bases in [word_start, pos) of its word
        w = jnp.clip(pos >> 5, 0, nw - 1)
        bits = pos & 31
        mask = (jnp.int64(1) << bits) - 1
        word = words[w].astype(jnp.uint32).astype(jnp.int64)
        return _popcount32((word & mask).astype(jnp.int32)).astype(
            jnp.int64)

    def q(pos):  # GC bases in [0, pos)
        w = jnp.clip(pos >> 5, 0, nw)
        return pref[w] + jnp.where(pos < nw * 32, partial_count(pos), 0)

    return q(ends) - q(starts)


def gc_count_ranges_device(seq: bytes, starts, ends,
                           interpret: bool = False) -> np.ndarray:
    """Device equivalent of io.fasta.gc_count_ranges: GC counts over
    1-based inclusive [start, end] ranges."""
    words = pack_gc_bits(seq)
    n = words.shape[0]
    pad = (-n) % TILE_WORDS
    if pad or n == 0:
        words = np.concatenate([words,
                                np.zeros(pad or TILE_WORDS, np.int32)])
    s = np.clip(np.asarray(starts, np.int64) - 1, 0, len(seq))
    e = np.clip(np.asarray(ends, np.int64), 0, len(seq))
    e = np.maximum(e, s)
    out = _gc_eval(jnp.asarray(words), jnp.asarray(s), jnp.asarray(e),
                   interpret=interpret)
    return np.asarray(out)
