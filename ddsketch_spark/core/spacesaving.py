"""SpaceSaving heavy-hitters sketch over string items (tokens).

Mergeable-UDAF protocol (``update / merge / to_bytes / from_bytes``) — the
north rule's top-k sibling next to DDSketch/CMS (the reference has no
heavy-hitter aggregate; this follows Metwally-Agrawal-El Abbadi
"Efficient computation of frequent and top-k elements in data streams"
with the mergeable-summaries combine of Agarwal et al. 2012). It replaces
the exact ``groupBy(token)`` top-k — whose per-key state is O(vocabulary),
i.e. billions of counters on a web corpus — with O(capacity) state per
partial (r3 review item 2).

State: at most ``capacity`` monitored items, each with an overestimate
``cnt`` and an error bound ``err``, plus a global ``floor`` bounding any
UNMONITORED item's true count. Invariants maintained by every update and
merge (pinned by tests/test_sketches.py + hypothesis property tests):

  (I1)  monitored x:    true(x) <= cnt(x) <= true(x) + err(x)
  (I2)  unmonitored y:  true(y) <= floor
  (I3)  monitored x:    cnt(x) >= floor

Classic guarantee: after a single stream, floor <= N/capacity, so any item
with true count > N/capacity is monitored. Merge credits an absent side
with its floor (an upper bound on what that stream could have held), keeps
the top-``capacity`` by count, and raises ``floor`` to the largest evicted
count — (I1)-(I3) hold under ANY merge tree, which is exactly what the
driver query verifies against the exact top-k oracle.

Determinism contract: given the same input partitioning, the result is
bit-identical (ties broken by item string ascending; serialization orders
by (cnt desc, err desc, item asc)). Unlike the integer-bucket sketches,
SpaceSaving is NOT bit-for-bit merge-order independent (eviction choices
depend on arrival order) — its contract is the (I1)-(I3) bound envelope,
and the catalog query checks the bounds, not raw state.
"""

from __future__ import annotations

import struct

import numpy as np

_HEADER = struct.Struct(">4siqqi")  # magic, capacity, floor, total, n_items
_ITEM_FIXED = struct.Struct(">qqi")  # cnt, err, len(utf8)


class SpaceSaving:
    input_dtype = "object"
    __slots__ = ("capacity", "counters", "floor", "total")

    def __init__(self, capacity: int = 4096):
        if capacity < 1:
            raise ValueError("SpaceSaving needs capacity >= 1")
        self.capacity = capacity
        self.counters: dict[str, list[int]] = {}   # item -> [cnt, err]
        self.floor = 0
        self.total = 0

    # ------------------------------------------------------------- update

    def update(self, values, counts=None) -> "SpaceSaving":
        """Batch insert: ``values`` is a sequence of strings; ``counts``
        optional positive weights.

        Fully vectorized: the batch collapses to exact (item, count)
        pairs (C-speed factorize), becomes its OWN SpaceSaving summary —
        top-``capacity`` items with exact counts (err 0) and
        floor = the (capacity+1)-th count, which satisfies (I1)-(I3)
        exactly for the batch — and folds into the state via
        :meth:`merge` (the batched update of the mergeable-summaries
        formulation, Agarwal et al. 2012 §3). vs the classic per-item
        min-eviction loop: identical invariants and identical result
        whenever nothing evicts; ~20x faster in the eviction-heavy
        regime because the only per-item Python left is a dict pass over
        <= 2*capacity entries per batch."""
        vals = np.asarray(values, dtype=object).ravel()
        if vals.size == 0:
            return self
        if counts is None:
            w = np.ones(vals.size, dtype=np.int64)
        else:
            w = np.asarray(counts)
            if np.any(np.isnan(w.astype(np.float64))):
                raise ValueError("NaN weight in SpaceSaving.update")
            w = w.astype(np.int64)
            if np.any(w <= 0):
                raise ValueError(
                    "count value for the sketch must be a positive integer")
        import pandas as pd
        sv = pd.Series(vals)
        keep = sv.notna().to_numpy()
        if not keep.all():
            sv, w = sv[keep], np.asarray(w)[keep]
        if len(sv) == 0:
            return self
        codes, uniques = pd.factorize(sv, sort=False)
        sums = np.zeros(len(uniques), dtype=np.int64)
        np.add.at(sums, codes, w)
        batch = SpaceSaving(self.capacity)
        batch.total = int(sums.sum())
        if len(uniques) <= self.capacity:
            batch.counters = {x: [int(n), 0]
                              for x, n in zip(uniques.tolist(), sums.tolist())}
        else:
            # deterministic top-m: count desc, item asc
            order = (pd.DataFrame({"c": sums, "t": uniques})
                     .sort_values(["c", "t"], ascending=[False, True],
                                  kind="mergesort").index.to_numpy())
            top = order[:self.capacity]
            batch.floor = int(sums[order[self.capacity]])
            batch.counters = {uniques[i]: [int(sums[i]), 0]
                              for i in top.tolist()}
        return self.merge(batch)

    # -------------------------------------------------------------- merge

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        if self.capacity != other.capacity:
            raise ValueError(
                "can't merge SpaceSaving sketches with different capacities")
        fa, fb = self.floor, other.floor
        merged: dict[str, list[int]] = {}
        for x, (cnt, err) in self.counters.items():
            o = other.counters.get(x)
            if o is not None:
                merged[x] = [cnt + o[0], err + o[1]]
            else:
                merged[x] = [cnt + fb, err + fb]
        for x, (cnt, err) in other.counters.items():
            if x not in merged:
                merged[x] = [fa + cnt, fa + err]
        floor = fa + fb
        if len(merged) > self.capacity:
            ranked = sorted(merged.items(),
                            key=lambda kv: (-kv[1][0], kv[0]))
            keep = ranked[:self.capacity]
            floor = max(floor, ranked[self.capacity][1][0])
            merged = dict(keep)
        self.counters = merged
        self.floor = floor
        self.total += other.total
        return self

    # ------------------------------------------------------------ queries

    def get(self, item: str) -> tuple[int, int] | None:
        """(cnt, err) if monitored, else None (true count <= floor)."""
        e = self.counters.get(item)
        return (e[0], e[1]) if e is not None else None

    def topk(self, k: int) -> list[tuple[str, int, int]]:
        """Top-k monitored items by (cnt desc, item asc): (item, cnt, err)."""
        ranked = sorted(self.counters.items(), key=lambda kv: (-kv[1][0], kv[0]))
        return [(x, e[0], e[1]) for x, e in ranked[:k]]

    # -------------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        parts = [_HEADER.pack(b"SSK1", self.capacity, self.floor, self.total,
                              len(self.counters))]
        items = sorted(self.counters.items(),
                       key=lambda kv: (-kv[1][0], -kv[1][1], kv[0]))
        for x, (cnt, err) in items:
            b = x.encode("utf-8")
            parts.append(_ITEM_FIXED.pack(cnt, err, len(b)))
            parts.append(b)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "SpaceSaving":
        magic, capacity, floor, total, n = _HEADER.unpack_from(data)
        if magic != b"SSK1":
            raise ValueError("invalid SpaceSaving sketch bytes")
        s = cls(capacity)
        s.floor, s.total = floor, total
        off = _HEADER.size
        for _ in range(n):
            cnt, err, blen = _ITEM_FIXED.unpack_from(data, off)
            off += _ITEM_FIXED.size
            s.counters[data[off:off + blen].decode("utf-8")] = [cnt, err]
            off += blen
        if off != len(data):
            raise ValueError(f"invalid SpaceSaving size {len(data)}")
        return s

    def __eq__(self, other) -> bool:
        return (isinstance(other, SpaceSaving)
                and self.capacity == other.capacity
                and self.floor == other.floor
                and self.total == other.total
                and self.counters == other.counters)


def from_bytes(data: bytes) -> "SpaceSaving":
    """Module-level alias — plain functions pickle by reference into Spark
    closures, bound classmethods don't (same pattern as core.ddsketch)."""
    return SpaceSaving.from_bytes(data)
