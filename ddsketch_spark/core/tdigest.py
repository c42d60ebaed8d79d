"""t-digest quantile sketch (Dunning's merging variant, k1 scale function)
— tail-accurate sibling to DDSketch (north rule; the reference has none).

Mergeable-UDAF protocol (``update / merge / to_bytes / from_bytes``).
Fully deterministic given input order (no RNG), but — like every t-digest —
the centroid layout depends on merge order, so cross-partition results are
bounded-error rather than bit-reproducible; driver queries verify the
rank-error bound (same weaker-check category as KLL).

Centroids are (mean, weight) pairs; a merge pass sorts all points by mean
and greedily grows each centroid while its k-scale span
``k(q) = delta/(2*pi) * asin(2q - 1)`` stays within 1. Tails (q near 0/1)
get tiny centroids -> relative rank error shrinks at the tails.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_HEADER = struct.Struct(">4sdqddi")  # magic, delta, count, min, max, ncentroids


class TDigest:
    input_dtype = "float64"
    __slots__ = ("delta", "means", "weights", "count", "vmin", "vmax",
                 "_buf_v", "_buf_w")

    def __init__(self, delta: float = 100.0):
        if delta < 10:
            raise ValueError("TDigest needs delta >= 10")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)
        self.count = 0
        self.vmin = math.inf
        self.vmax = -math.inf
        self._buf_v: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []

    # ------------------------------------------------------------------
    def update(self, values, counts=None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64).ravel()
        if counts is None:
            v = v[~np.isnan(v)]
            w = np.ones(v.size, dtype=np.int64)
        else:
            c = np.asarray(counts, dtype=np.float64).ravel()
            c = np.where(np.isnan(c), 1.0, c)
            keep = ~np.isnan(v)
            v, c = v[keep], c[keep]
            if np.any(c <= 0):
                raise ValueError("count value for the sketch must be a positive integer")
            w = c.astype(np.int64)
        if v.size == 0:
            return self
        self._buf_v.append(v)
        self._buf_w.append(w)
        self.count += int(w.sum())
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        if sum(b.size for b in self._buf_v) >= 8 * self.delta:
            self._compress()
        return self

    def _k(self, q: float) -> float:
        q = min(max(q, 0.0), 1.0)
        return self.delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)

    def _compress(self) -> None:
        if not self._buf_v and self.means.size == 0:
            return
        vs = [self.means] + self._buf_v
        ws = [self.weights] + self._buf_w
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        self._buf_v, self._buf_w = [], []
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = int(w.sum())

        out_means: list[float] = []
        out_weights: list[int] = []
        # greedy merge pass
        cur_sum = float(v[0]) * int(w[0])
        cur_w = int(w[0])
        w_before = 0
        k_left = self._k(0.0)
        for i in range(1, v.size):
            wi = int(w[i])
            q_right = (w_before + cur_w + wi) / total
            if self._k(q_right) - k_left <= 1.0:
                cur_sum += float(v[i]) * wi
                cur_w += wi
            else:
                out_means.append(cur_sum / cur_w)
                out_weights.append(cur_w)
                w_before += cur_w
                k_left = self._k(w_before / total)
                cur_sum = float(v[i]) * wi
                cur_w = wi
        out_means.append(cur_sum / cur_w)
        out_weights.append(cur_w)
        self.means = np.asarray(out_means, dtype=np.float64)
        self.weights = np.asarray(out_weights, dtype=np.int64)

    # ------------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("can't merge t-digests with different delta")
        other_flushed = other._flushed()
        if other_flushed.means.size:
            self._buf_v.append(other_flushed.means)
            self._buf_w.append(other_flushed.weights)
        self.count += other.count
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress()
        return self

    def _flushed(self) -> "TDigest":
        if self._buf_v:
            self._compress()
        return self

    # ------------------------------------------------------------------
    def quantile(self, qs) -> np.ndarray:
        scalar = np.isscalar(qs)
        qv = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        self._flushed()
        out = np.full(qv.shape, np.nan)
        m, w = self.means, self.weights
        if m.size:
            total = int(w.sum())
            # cumulative weight at centroid midpoints
            cum = np.cumsum(w) - w / 2.0
            for i, q in enumerate(qv.tolist()):
                target = q * total
                if target <= cum[0]:
                    out[i] = self.vmin if total > 1 else m[0]
                    if m.size > 1 or total > 1:
                        # interpolate min -> first centroid
                        frac = target / cum[0] if cum[0] > 0 else 0.0
                        out[i] = self.vmin + frac * (m[0] - self.vmin)
                elif target >= cum[-1]:
                    span = total - cum[-1]
                    frac = (target - cum[-1]) / span if span > 0 else 1.0
                    out[i] = m[-1] + frac * (self.vmax - m[-1])
                else:
                    j = int(np.searchsorted(cum, target, side="right"))
                    frac = (target - cum[j - 1]) / (cum[j] - cum[j - 1])
                    out[i] = m[j - 1] + frac * (m[j] - m[j - 1])
        return out[0] if scalar else out

    def rank_of(self, xs) -> np.ndarray:
        scalar = np.isscalar(xs)
        xv = np.atleast_1d(np.asarray(xs, dtype=np.float64))
        self._flushed()
        out = np.full(xv.shape, np.nan)
        m, w = self.means, self.weights
        if m.size:
            total = int(w.sum())
            cum = np.cumsum(w) - w / 2.0
            for i, x in enumerate(xv.tolist()):
                if x <= self.vmin:
                    out[i] = 0.0
                elif x >= self.vmax:
                    out[i] = 1.0
                else:
                    out[i] = float(np.interp(x, m, cum / total))
        return out[0] if scalar else out

    # ------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._flushed()
        out = bytearray(_HEADER.pack(b"TDG1", self.delta, self.count,
                                     self.vmin, self.vmax, self.means.size))
        out += self.means.astype(">f8").tobytes()
        out += self.weights.astype(">i8").tobytes()
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        magic, delta, count, vmin, vmax, n = _HEADER.unpack_from(data)
        if magic != b"TDG1":
            raise ValueError("invalid t-digest sketch bytes")
        s = cls(delta)
        off = _HEADER.size
        s.means = np.frombuffer(data, dtype=">f8", count=n, offset=off).astype(np.float64)
        off += 8 * n
        s.weights = np.frombuffer(data, dtype=">i8", count=n, offset=off).astype(np.int64)
        off += 8 * n
        if off != len(data):
            raise ValueError(f"invalid t-digest size {len(data)}")
        s.count, s.vmin, s.vmax = count, vmin, vmax
        return s


def from_bytes(data: bytes) -> "TDigest":
    """Module-level alias — plain functions pickle by reference into Spark
    closures, bound classmethods don't (same pattern as core.ddsketch)."""
    return TDigest.from_bytes(data)
