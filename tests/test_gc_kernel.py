"""Pallas GC kernel vs the numpy reference implementation."""

import random

import numpy as np
import pytest

from pandepth_tpu.device.gc_kernel import (gc_count_ranges_device,
                                           pack_gc_bits, word_popcounts)
from pandepth_tpu.io.fasta import gc_count_ranges


def _random_seq(n, seed):
    rng = random.Random(seed)
    return "".join(rng.choice("ACGTacgtNn") for _ in range(n)).encode()


def test_pack_and_popcount_roundtrip():
    seq = _random_seq(100_000, 3)
    words = pack_gc_bits(seq)
    pad = (-len(words)) % (256 * 128)
    words_p = np.concatenate([words, np.zeros(pad, np.int32)])
    counts = np.asarray(word_popcounts(words_p, interpret=True))
    total = counts.sum()
    expected = sum(seq.count(b) for b in (ord("G"), ord("g"),
                                          ord("C"), ord("c")))
    assert total == expected


@pytest.mark.parametrize("n,seed", [(1000, 1), (65_536, 2), (99_999, 7)])
def test_gc_ranges_match_numpy(n, seed):
    seq = _random_seq(n, seed)
    rng = np.random.RandomState(seed)
    starts = rng.randint(1, n + 50, 300)
    ends = starts + rng.randint(0, 500, 300)
    expected = gc_count_ranges(seq, starts, ends)
    got = gc_count_ranges_device(seq, starts, ends, interpret=True)
    np.testing.assert_array_equal(got, expected)


def test_gc_ranges_edge_cases():
    seq = b"GCGCGCgcgc"
    starts = np.array([1, 1, 5, 10, 11, 0])
    ends = np.array([10, 1, 5, 10, 20, 0])
    expected = gc_count_ranges(seq, starts, ends)
    got = gc_count_ranges_device(seq, starts, ends, interpret=True)
    np.testing.assert_array_equal(got, expected)
