"""Gzip-transparent text I/O helpers.

Covers the roles of the reference's gzstream (include/gzstream.h:92-112)
and ``ReadList`` (include/comm.h:31-48): reading possibly-gzipped text
line streams and writing gzip-member-framed TSV tables that stay
``zcat``-compatible.
"""

from __future__ import annotations

import gzip
from typing import IO, Iterator, List


def open_text(path: str) -> IO[str]:
    with open(path, "rb") as fh:
        magic = fh.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rt")
    return open(path, "r")


def iter_text_lines(path: str) -> Iterator[str]:
    """Yield lines without trailing newline (gzip-transparent)."""
    with open_text(path) as fh:
        for line in fh:
            yield line.rstrip("\n").rstrip("\r")


def read_list(path: str) -> List[str]:
    """Read a ``.list`` file of input paths, one per line, skipping
    blank lines (reference ReadList, include/comm.h:31-48)."""
    return [ln for ln in iter_text_lines(path) if ln]


def add_gz_suffix(path: str) -> str:
    """Append ``.gz`` unless already present (include/comm.h:50-58)."""
    return path if path.endswith(".gz") else path + ".gz"


class GzTextWriter:
    """Buffered gzip text writer for the stat tables."""

    def __init__(self, path: str, level: int = 6):
        self._fh = gzip.open(path, "wt", compresslevel=level)

    def write(self, s: str) -> None:
        self._fh.write(s)

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
