"""Count-min sketch over pre-hashed 60-bit values.

Mergeable-UDAF protocol (``update / merge / to_bytes / from_bytes``) — the
north rule's count-min sibling next to DDSketch (the reference has no CM;
this follows Cormode-Muthukrishnan with Kirsch-Mitzenmacher double
hashing from :mod:`ddsketch_spark.core.hashing`).

Determinism contract: counters are integer sums — merge is associative and
commutative, estimates are exact integer reads, so frequency queries
hash-compare against the SQL mirror (:func:`ddsketch_spark.oracles.cms_freq_sql`).

Guarantee: with width w and depth d, est(x) >= true(x) and
est(x) <= true(x) + e*N with probability 1 - delta, where e = e/w ~ 2.718/w
and delta = exp(-d).
"""

from __future__ import annotations

import struct

import numpy as np

from ddsketch_spark.core.hashing import positions

_HEADER = struct.Struct(">4siiq")  # magic, depth, width, count


class CMS:
    input_dtype = "int64"
    __slots__ = ("depth", "width", "table", "count")

    def __init__(self, depth: int = 5, width: int = 2048):
        if depth < 1 or width < 2:
            raise ValueError("CMS needs depth >= 1 and width >= 2")
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.count = 0

    def update(self, hashes, counts=None) -> "CMS":
        h = np.asarray(hashes, dtype=np.int64).ravel()
        if h.size == 0:
            return self
        if counts is None:
            c = np.ones(h.size, dtype=np.int64)
        else:
            c = np.asarray(counts, dtype=np.int64).ravel()
            if np.any(c <= 0):
                raise ValueError("count value for the sketch must be a positive integer")
        pos = positions(h, self.depth, self.width)
        for i in range(self.depth):
            np.add.at(self.table[i], pos[i], c)
        self.count += int(c.sum())
        return self

    def merge(self, other: "CMS") -> "CMS":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("can't merge CMS sketches with different shapes")
        self.table += other.table
        self.count += other.count
        return self

    def estimate(self, hashes) -> np.ndarray:
        """Point frequency estimates (int64) for pre-hashed values."""
        h = np.atleast_1d(np.asarray(hashes, dtype=np.int64))
        pos = positions(h, self.depth, self.width)
        ests = self.table[np.arange(self.depth)[:, None], pos]
        return ests.min(axis=0)

    def to_bytes(self) -> bytes:
        return (_HEADER.pack(b"CMS1", self.depth, self.width, self.count)
                + self.table.astype(">i8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CMS":
        magic, depth, width, count = _HEADER.unpack_from(data)
        if magic != b"CMS1":
            raise ValueError("invalid CMS sketch bytes")
        s = cls(depth, width)
        n = depth * width
        if len(data) != _HEADER.size + 8 * n:
            raise ValueError(f"invalid CMS size {len(data)}")
        s.table = (np.frombuffer(data, dtype=">i8", count=n, offset=_HEADER.size)
                   .astype(np.int64).reshape(depth, width))
        s.count = count
        return s

    def __eq__(self, other) -> bool:
        return (isinstance(other, CMS) and self.depth == other.depth
                and self.width == other.width
                and np.array_equal(self.table, other.table))


def from_bytes(data: bytes) -> "CMS":
    """Module-level alias — plain functions pickle by reference into Spark
    closures, bound classmethods don't (same pattern as core.ddsketch)."""
    return CMS.from_bytes(data)
