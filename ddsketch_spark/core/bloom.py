"""Bloom filter over pre-hashed 60-bit values.

Mergeable-UDAF protocol (``update / merge / to_bytes / from_bytes``) — the
north rule's Bloom sibling (the reference has none; Spark's own
``DataFrame.stat.bloomFilter`` exists only on the Scala side and is not
mergeable from Python, SURVEY §2.4).

Determinism contract: the bit set is a pure function of the input set
(merge = bitwise OR: associative, commutative, idempotent), so membership
queries hash-compare against the SQL mirror
(:func:`ddsketch_spark.oracles.bloom_member_sql`).

FPR ~ (1 - e^(-k n / m))^k; k hash positions via double hashing.
"""

from __future__ import annotations

import struct

import numpy as np

from ddsketch_spark.core.hashing import positions

_HEADER = struct.Struct(">4sqiq")  # magic, nbits, k, count


class Bloom:
    input_dtype = "int64"
    __slots__ = ("nbits", "k", "bits", "count")

    def __init__(self, nbits: int = 1 << 16, k: int = 5):
        if nbits < 8 or k < 1:
            raise ValueError("Bloom needs nbits >= 8 and k >= 1")
        self.nbits = nbits
        self.k = k
        self.bits = np.zeros(nbits, dtype=bool)
        self.count = 0

    def update(self, hashes, counts=None) -> "Bloom":
        h = np.asarray(hashes, dtype=np.int64).ravel()
        if h.size == 0:
            return self
        pos = positions(h, self.k, self.nbits)
        self.bits[pos.ravel()] = True
        self.count += int(h.size if counts is None else np.sum(counts))
        return self

    def merge(self, other: "Bloom") -> "Bloom":
        if (self.nbits, self.k) != (other.nbits, other.k):
            raise ValueError("can't merge Bloom filters with different shapes")
        self.bits |= other.bits
        self.count += other.count
        return self

    def contains(self, hashes) -> np.ndarray:
        h = np.atleast_1d(np.asarray(hashes, dtype=np.int64))
        pos = positions(h, self.k, self.nbits)
        return self.bits[pos].all(axis=0)

    def fill_ratio(self) -> float:
        return float(np.count_nonzero(self.bits)) / self.nbits

    def to_bytes(self) -> bytes:
        return (_HEADER.pack(b"BLM1", self.nbits, self.k, self.count)
                + np.packbits(self.bits).tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "Bloom":
        magic, nbits, k, count = _HEADER.unpack_from(data)
        if magic != b"BLM1":
            raise ValueError("invalid Bloom sketch bytes")
        s = cls(nbits, k)
        nbytes = (nbits + 7) // 8
        if len(data) != _HEADER.size + nbytes:
            raise ValueError(f"invalid Bloom size {len(data)}")
        packed = np.frombuffer(data, dtype=np.uint8, count=nbytes, offset=_HEADER.size)
        s.bits = np.unpackbits(packed)[:nbits].astype(bool)
        s.count = count
        return s

    def __eq__(self, other) -> bool:
        return (isinstance(other, Bloom) and self.nbits == other.nbits
                and self.k == other.k and np.array_equal(self.bits, other.bits))


def from_bytes(data: bytes) -> "Bloom":
    """Module-level alias — plain functions pickle by reference into Spark
    closures, bound classmethods don't (same pattern as core.ddsketch)."""
    return Bloom.from_bytes(data)
