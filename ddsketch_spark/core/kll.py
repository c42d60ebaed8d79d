"""KLL quantile sketch (Karnin-Lang-Liberty) — uniform-rank-error sibling
to DDSketch's relative-error guarantee (north rule; the reference has no
KLL).

Mergeable-UDAF protocol (``update / merge / to_bytes / from_bytes``). The
classic algorithm compacts with a random offset; we use a deterministic
alternating offset (per-sketch flip counter) so single-partition results
are reproducible. Across partitions the estimate still depends on merge
order — KLL is *mergeable with bounded error* but not bucket-identical
under re-association — so its driver queries verify the rank-error bound
rather than hash-identity (SURVEY §5: "for genuinely non-SQL-expressible
ops the driver records a weaker check").

Structure: levels of value buffers; level h items carry weight 2^h.
Compacting level h sorts it and promotes every other item to h+1.
Rank error ~ O(1/k) with k=200 giving ~1-2% observed; tests assert 3%.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_HEADER = struct.Struct(">4siqqi")  # magic, k, count, flips, nlevels


class KLL:
    input_dtype = "float64"
    __slots__ = ("k", "levels", "count", "flips")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("KLL needs k >= 8")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.count = 0
        self.flips = 0

    def _cap(self, h: int) -> int:
        # top level holds k items; each level below holds (2/3) of the one above
        depth = len(self.levels) - 1 - h
        return max(2, int(math.ceil(self.k * (2.0 / 3.0) ** depth)))

    # ------------------------------------------------------------------
    def update(self, values, counts=None) -> "KLL":
        v = np.asarray(values, dtype=np.float64).ravel()
        if counts is None:
            keep = ~np.isnan(v)
            v = v[keep]
            if v.size == 0:
                return self
            self.levels[0] = np.concatenate([self.levels[0], v])
            self.count += int(v.size)
        else:
            c = np.asarray(counts, dtype=np.float64).ravel()
            c = np.where(np.isnan(c), 1.0, c)
            keep = ~np.isnan(v)
            v, c = v[keep], c[keep].astype(np.int64)
            if np.any(c <= 0):
                raise ValueError("count value for the sketch must be a positive integer")
            if v.size == 0:
                return self
            # weight w decomposes in binary: bit b set -> one copy at level b
            maxbit = int(c.max()).bit_length()
            for b in range(maxbit):
                sel = (c >> b) & 1 == 1
                if not sel.any():
                    continue
                while len(self.levels) <= b:
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[b] = np.concatenate([self.levels[b], v[sel]])
            self.count += int(c.sum())
        self._compact()
        return self

    def _compact(self) -> None:
        h = 0
        while h < len(self.levels):
            lvl = self.levels[h]
            if lvl.size <= self._cap(h):
                h += 1
                continue
            lvl = np.sort(lvl, kind="stable")
            offset = self.flips & 1
            self.flips += 1
            promoted = lvl[offset::2]
            self.levels[h] = np.empty(0, dtype=np.float64)
            if h + 1 >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])
            # adding a level changes caps; restart from the bottom
            h = 0

    # ------------------------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("can't merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lvl in enumerate(other.levels):
            if lvl.size:
                self.levels[h] = np.concatenate([self.levels[h], lvl])
        self.count += other.count
        self.flips += other.flips
        self._compact()
        return self

    # ------------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vs, ws = [], []
        for h, lvl in enumerate(self.levels):
            if lvl.size:
                vs.append(lvl)
                ws.append(np.full(lvl.size, 1 << h, dtype=np.int64))
        if not vs:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, qs) -> np.ndarray:
        """Lower-quantile convention (goal = q*(W-1), strict > stop) — same
        extraction convention as the DDSketch kernel for consistency."""
        scalar = np.isscalar(qs)
        qv = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        v, w = self._weighted_items()
        out = np.full(qv.shape, np.nan)
        if v.size:
            cum = np.cumsum(w)
            total = cum[-1]
            for i, q in enumerate(qv.tolist()):
                goal = q * (total - 1)
                idx = int(np.searchsorted(cum, goal, side="right"))
                out[i] = v[min(idx, v.size - 1)]
        return out[0] if scalar else out

    def rank_of(self, xs) -> np.ndarray:
        scalar = np.isscalar(xs)
        xv = np.atleast_1d(np.asarray(xs, dtype=np.float64))
        v, w = self._weighted_items()
        out = np.full(xv.shape, np.nan)
        if v.size:
            cum = np.concatenate([[0], np.cumsum(w)])
            total = cum[-1]
            for i, x in enumerate(xv.tolist()):
                below = cum[int(np.searchsorted(v, x, side="left"))]
                out[i] = below / max(total - 1, 1)
        return out[0] if scalar else out

    # ------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        out = bytearray(_HEADER.pack(b"KLL1", self.k, self.count, self.flips,
                                     len(self.levels)))
        for lvl in self.levels:
            out += struct.pack(">i", lvl.size)
            out += lvl.astype(">f8").tobytes()
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        magic, k, count, flips, nlevels = _HEADER.unpack_from(data)
        if magic != b"KLL1":
            raise ValueError("invalid KLL sketch bytes")
        s = cls(k)
        s.count, s.flips = count, flips
        s.levels = []
        off = _HEADER.size
        for _ in range(nlevels):
            (n,) = struct.unpack_from(">i", data, off)
            off += 4
            s.levels.append(np.frombuffer(data, dtype=">f8", count=n, offset=off)
                            .astype(np.float64))
            off += 8 * n
        if off != len(data):
            raise ValueError(f"invalid KLL size {len(data)}")
        return s


def from_bytes(data: bytes) -> "KLL":
    """Module-level alias — plain functions pickle by reference into Spark
    closures, bound classmethods don't (same pattern as core.ddsketch)."""
    return KLL.from_bytes(data)
