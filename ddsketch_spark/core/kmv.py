"""KMV (bottom-k / K-Minimum-Values) distinct-value sketch over
pre-hashed 60-bit values.

Mergeable-UDAF protocol (``update / merge / to_bytes / from_bytes``) —
the set-operation sibling of HLL: like HLL it estimates NDV, but because
its state is an actual sample of the hash space (the k smallest distinct
hashes), sketches support UNION (bottom-k of the merged sets) and
INTERSECTION cardinality (Beyer et al., "On synopses for distinct-value
estimation under multiset operations", SIGMOD'07) — which HLL register
maxima cannot express.

Determinism contract: the state is the exact set of the k smallest
distinct hashes — a pure function of the input SET, independent of
order, partitioning, and merge tree (merge is bottom-k of a set union,
so it is exactly associative, commutative, and idempotent). Estimates
are fixed float expressions over that state, so queries hash-compare
against a DuckDB replay (ORDER BY h LIMIT k + the same literals).

Estimator: with fewer than k distinct hashes the sketch IS the set
(exact count). At capacity, ndv ~ (k-1) * M / kth_smallest, M = 2^60.
Intersection: rho = |X ∩ A ∩ B| / |X| over the union synopsis X, scaled
by the union estimate. Relative error ~ 1/sqrt(k-2).
"""

from __future__ import annotations

import struct

import numpy as np

M_HASH_SPACE = float(1 << 60)

_HEADER = struct.Struct(">4sii")  # magic, k, n_items


class KMV:
    input_dtype = "int64"
    __slots__ = ("k", "values")

    def __init__(self, k: int = 1024):
        if k < 2:
            raise ValueError("KMV needs k >= 2")
        self.k = k
        self.values = np.empty(0, dtype=np.int64)   # sorted ascending

    def update(self, hashes, counts=None) -> "KMV":
        """Insert pre-hashed values; ``counts`` is accepted (pipeline
        contract) and ignored — multiplicity is irrelevant to NDV."""
        h = np.asarray(hashes, dtype=np.int64).ravel()
        if h.size == 0:
            return self
        if self.values.size == self.k:
            h = h[h < self.values[-1]]      # below current kth bound only
            if h.size == 0:
                return self
        merged = np.unique(np.concatenate([self.values, h]))
        self.values = merged[:self.k]
        return self

    def merge(self, other: "KMV") -> "KMV":
        if self.k != other.k:
            raise ValueError("can't merge KMV sketches with different k")
        merged = np.unique(np.concatenate([self.values, other.values]))
        self.values = merged[:self.k]
        return self

    # ------------------------------------------------------------ queries

    def estimate(self) -> float:
        """NDV estimate — exact below capacity."""
        n = int(self.values.size)
        if n < self.k:
            return float(n)
        # (k-1)*M precomputed: exactly representable (small * power of 2),
        # mirrored as a literal in the SQL oracle
        return (self.k - 1) * M_HASH_SPACE / float(self.values[-1])

    def copy(self) -> "KMV":
        s = KMV(self.k)
        s.values = self.values.copy()
        return s

    # -------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        return (_HEADER.pack(b"KMV1", self.k, int(self.values.size))
                + self.values.astype(">i8").tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "KMV":
        magic, k, n = _HEADER.unpack_from(data)
        if magic != b"KMV1":
            raise ValueError("invalid KMV sketch bytes")
        if len(data) != _HEADER.size + 8 * n:
            raise ValueError(f"invalid KMV size {len(data)}")
        s = cls(k)
        s.values = (np.frombuffer(data, dtype=">i8", count=n,
                                  offset=_HEADER.size).astype(np.int64))
        return s

    def __eq__(self, other) -> bool:
        return (isinstance(other, KMV) and self.k == other.k
                and np.array_equal(self.values, other.values))


def from_bytes(data: bytes) -> "KMV":
    """Module-level alias — plain functions pickle by reference into Spark
    closures, bound classmethods don't (same pattern as core.ddsketch)."""
    return KMV.from_bytes(data)


def union_estimate(a: KMV, b: KMV) -> float:
    return a.copy().merge(b).estimate()


def intersection_estimate(a: KMV, b: KMV) -> float:
    """|A ∩ B| via the union synopsis X (Beyer et al. SIGMOD'07):
    rho = |{v in X : v in sketch(A) and v in sketch(B)}| / |X|,
    scaled by the union estimate. Deterministic given the two states."""
    u = a.copy().merge(b)
    nx = int(u.values.size)
    if nx == 0:
        return 0.0
    in_both = np.intersect1d(
        np.intersect1d(u.values, a.values, assume_unique=True),
        b.values, assume_unique=True)
    return int(in_both.size) / float(nx) * u.estimate()
