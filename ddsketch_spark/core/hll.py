"""HyperLogLog distinct-count sketch over pre-hashed 60-bit values.

Same mergeable-UDAF protocol as :class:`~ddsketch_spark.core.ddsketch.DDSketch`
(``update / merge / to_bytes / from_bytes``), so it plugs straight into the
2-stage :func:`~ddsketch_spark.operators.aggregate.sketch_agg` pipeline
(SURVEY §7.1 step 4 — the north rule's sibling-sketch requirement; the
reference itself is DDSketch-only).

Determinism contract: the estimate is a pure function of the *set* of input
values — registers are element-wise max, so merge is associative,
commutative, and idempotent, and the estimate is independent of
partitioning. That lets the driver hash-compare against an exact SQL mirror
(:func:`ddsketch_spark.oracles.hll_ndv_sql`).

Math (classic Flajolet et al. HLL with linear-counting small-range
correction; no empirical bias table):

- ``p`` register bits, ``m = 2^p`` registers; input hash h in [0, 2^60)
- register ``j = h % m``, remainder ``w = h // m`` (W = 60 - p bits)
- ``rho = W - bit_length(w) + 1`` (w == 0 -> W + 1)
- raw estimate ``alpha_m * m^2 / sum_j 2^(-M_j)``; the sum is computed in
  *integer* arithmetic as ``S = sum_j 2^(Q - M_j)`` with ``Q = W + 1``
  (S <= 2^61, exact), then one float division — so the float result is
  bit-identical no matter the summation order or engine
- small range: raw <= 2.5 m and V zero registers > 0 -> ``m * ln(m / V)``
- 60-bit hash space -> no large-range correction needed at any realistic NDV
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ddsketch_spark.core.hashing import H64_BITS, bit_length_u48

_HEADER = struct.Struct(">4sBq")  # magic, p, count


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


class HLL:
    """Dense HyperLogLog. ``update`` takes already-hashed int64 values
    (see :mod:`ddsketch_spark.core.hashing`) — hashing stays JVM-side."""

    input_dtype = "int64"
    __slots__ = ("p", "m", "registers", "count")

    def __init__(self, p: int = 12):
        if not (4 <= p <= 18):
            raise ValueError(f"HLL precision p={p} not in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.count = 0  # rows observed (lineage), not NDV

    # ------------------------------------------------------------------
    def update(self, hashes, counts=None) -> "HLL":
        h = np.asarray(hashes, dtype=np.int64).ravel()
        if h.size == 0:
            return self
        W = H64_BITS - self.p
        j = (h % self.m).astype(np.int64)
        w = h >> self.p  # == h // m for non-negative h with power-of-two m
        rho = (W - bit_length_u48(w) + 1).astype(np.uint8)  # w=0 -> W+1
        np.maximum.at(self.registers, j, rho)
        self.count += int(h.size if counts is None else np.sum(counts))
        return self

    def merge(self, other: "HLL") -> "HLL":
        if self.p != other.p:
            raise ValueError("can't merge HLL sketches with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        self.count += other.count
        return self

    # ------------------------------------------------------------------
    def estimate(self) -> float:
        Q = H64_BITS - self.p + 1
        regs = self.registers.astype(np.int64)
        # exact integer power sum — order-independent, engine-independent
        s_int = int(np.sum(np.int64(1) << (Q - regs)))
        raw = (_alpha(self.m) * self.m * self.m * float(1 << Q)) / float(s_int)
        zeros = int(np.count_nonzero(regs == 0))
        if raw <= 2.5 * self.m and zeros > 0:
            return self.m * math.log(self.m / zeros)
        return raw

    # ------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return _HEADER.pack(b"HLL1", self.p, self.count) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HLL":
        magic, p, count = _HEADER.unpack_from(data)
        if magic != b"HLL1":
            raise ValueError("invalid HLL sketch bytes")
        s = cls(p)
        regs = np.frombuffer(data, dtype=np.uint8, count=s.m, offset=_HEADER.size)
        if len(data) != _HEADER.size + s.m:
            raise ValueError(f"invalid HLL size {len(data)}")
        s.registers = regs.copy()
        s.count = count
        return s

    def __eq__(self, other) -> bool:
        return (isinstance(other, HLL) and self.p == other.p
                and np.array_equal(self.registers, other.registers))


def from_bytes(data: bytes) -> "HLL":
    """Module-level alias — plain functions pickle by reference into Spark
    closures, bound classmethods don't (same pattern as core.ddsketch)."""
    return HLL.from_bytes(data)
