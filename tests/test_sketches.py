"""Unit tests for the sibling sketch kernels (HLL, count-min, Bloom, KLL,
t-digest) — accuracy vs exact oracles, merge laws, serde round-trips.
Model: reference test strategy (SURVEY §5) extended to the north rule's
sibling sketches.
"""

import numpy as np
import pytest

from ddsketch_spark.core.bloom import Bloom
from ddsketch_spark.core.cms import CMS
from ddsketch_spark.core.hashing import (
    bit_length_u48, py_h64, py_positions, positions,
)
from ddsketch_spark.core.hll import HLL
from ddsketch_spark.core.kll import KLL
from ddsketch_spark.core.tdigest import TDigest

RNG = np.random.default_rng(23982)


def rand_hashes(n, seed=1):
    return np.random.default_rng(seed).integers(0, 1 << 60, size=n, dtype=np.int64)


# ---------------------------------------------------------------- hashing

def test_bit_length_exact():
    ws = np.array([0, 1, 2, 3, 4, 7, 8, (1 << 48) - 1, 1 << 47], dtype=np.int64)
    expect = np.array([int(w).bit_length() for w in ws.tolist()])
    assert np.array_equal(bit_length_u48(ws), expect)


def test_positions_match_python():
    h = np.array([py_h64("hello"), py_h64("world")], dtype=np.int64)
    pos = positions(h, 4, 997)
    assert pos[:, 0].tolist() == py_positions("hello", 4, 997)
    assert pos[:, 1].tolist() == py_positions("world", 4, 997)


# ---------------------------------------------------------------- HLL

def test_hll_accuracy():
    for ndv in (100, 5_000, 200_000):
        h = rand_hashes(ndv, seed=ndv)
        s = HLL(p=12).update(np.repeat(h, 2))  # duplicates must not matter
        est = s.estimate()
        rel = abs(est - ndv) / ndv
        assert rel < 0.05, (ndv, est)  # 3 sigma of 1.04/sqrt(4096) ~ 4.9%


def test_hll_merge_laws():
    a = HLL(p=10).update(rand_hashes(1000, 1))
    b = HLL(p=10).update(rand_hashes(1000, 2))
    c = HLL(p=10).update(rand_hashes(1000, 3))
    ab_c = HLL.from_bytes(a.to_bytes()).merge(b).merge(c)
    a_bc = HLL.from_bytes(a.to_bytes()).merge(
        HLL.from_bytes(b.to_bytes()).merge(c))
    ba = HLL.from_bytes(b.to_bytes()).merge(a)
    assert ab_c == a_bc
    assert ba.merge(c) == ab_c
    # idempotent
    aa = HLL.from_bytes(a.to_bytes()).merge(a)
    assert np.array_equal(aa.registers, a.registers)


def test_hll_merge_equals_union_build():
    h1, h2 = rand_hashes(5000, 7), rand_hashes(5000, 8)
    merged = HLL(p=12).update(h1).merge(HLL(p=12).update(h2))
    direct = HLL(p=12).update(np.concatenate([h1, h2]))
    assert merged == direct


def test_hll_small_range_linear_counting():
    s = HLL(p=12).update(rand_hashes(10, 4))
    assert abs(s.estimate() - 10) < 1.0


def test_hll_serde_roundtrip():
    s = HLL(p=12).update(rand_hashes(1234, 5))
    s2 = HLL.from_bytes(s.to_bytes())
    assert s2 == s and s2.estimate() == s.estimate() and s2.count == s.count


def test_hll_p_mismatch_merge_errors():
    with pytest.raises(ValueError):
        HLL(p=10).merge(HLL(p=12))


# ---------------------------------------------------------------- CMS

def test_cms_frequency_bounds():
    # zipf-ish frequencies over 500 distinct items
    items = rand_hashes(500, 11)
    freqs = (10000 / np.arange(1, 501) ** 1.2).astype(np.int64) + 1
    s = CMS(depth=5, width=2048)
    s.update(items, freqs)
    est = s.estimate(items)
    n = int(freqs.sum())
    assert np.all(est >= freqs)                      # never undercounts
    assert np.all(est - freqs <= 2 * math_e() * n / 2048 + 1)


def math_e():
    import math
    return math.e


def test_cms_merge_equals_union_build():
    h1, h2 = rand_hashes(3000, 12), rand_hashes(3000, 13)
    merged = CMS(4, 512).update(h1).merge(CMS(4, 512).update(h2))
    direct = CMS(4, 512).update(np.concatenate([h1, h2]))
    assert merged == direct


def test_cms_serde_roundtrip():
    s = CMS(5, 1024).update(rand_hashes(2000, 14))
    s2 = CMS.from_bytes(s.to_bytes())
    assert s2 == s and s2.count == s.count


def test_cms_rejects_nonpositive_counts():
    with pytest.raises(ValueError):
        CMS(2, 64).update(rand_hashes(3, 15), np.array([1, 0, 2]))


# ---------------------------------------------------------------- Bloom

def test_bloom_no_false_negatives_and_low_fpr():
    present = rand_hashes(5000, 21)
    absent = rand_hashes(5000, 22)
    s = Bloom(nbits=1 << 16, k=5).update(present)
    assert s.contains(present).all()
    fpr = s.contains(absent).mean()
    assert fpr < 0.05, fpr  # theoretical ~ 0.022 at n/m ~ 0.076


def test_bloom_merge_is_or():
    h1, h2 = rand_hashes(100, 23), rand_hashes(100, 24)
    merged = Bloom(1 << 12, 3).update(h1).merge(Bloom(1 << 12, 3).update(h2))
    direct = Bloom(1 << 12, 3).update(np.concatenate([h1, h2]))
    assert merged == direct


def test_bloom_serde_roundtrip():
    s = Bloom(1 << 14, 4).update(rand_hashes(777, 25))
    s2 = Bloom.from_bytes(s.to_bytes())
    assert s2 == s and s2.count == s.count


# ---------------------------------------------------------------- KLL

DISTS = {
    "uniform": lambda rng, n: rng.uniform(0, 1000, n),
    "lognormal": lambda rng, n: rng.lognormal(3, 1.5, n),
    "pareto": lambda rng, n: rng.pareto(1.5, n) + 1.0,
}
QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def exact_rank(data, x):
    return np.searchsorted(np.sort(data), x, side="left") / (len(data) - 1)


def test_kll_rank_error():
    for name, gen in DISTS.items():
        data = gen(np.random.default_rng(31), 100_000)
        s = KLL(k=200)
        for chunk in np.array_split(data, 10):
            s.update(chunk)
        for q in QS:
            est = float(s.quantile(q))
            assert abs(exact_rank(data, est) - q) < 0.03, (name, q)


def test_kll_merge_rank_error():
    data = DISTS["lognormal"](np.random.default_rng(32), 80_000)
    parts = np.array_split(data, 8)
    sketches = [KLL(k=200).update(p) for p in parts]
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.merge(s)
    assert acc.count == len(data)
    for q in QS:
        est = float(acc.quantile(q))
        assert abs(exact_rank(data, est) - q) < 0.04, q


def test_kll_weighted_equals_expanded():
    rng = np.random.default_rng(33)
    vals = rng.uniform(0, 100, 500)
    wts = rng.integers(1, 6, 500)
    a = KLL(k=200).update(vals, wts)
    expanded = np.repeat(vals, wts)
    assert a.count == expanded.size
    for q in (0.1, 0.5, 0.9):
        est = float(a.quantile(q))
        assert abs(exact_rank(expanded, est) - q) < 0.04


def test_kll_serde_roundtrip():
    s = KLL(k=128).update(np.random.default_rng(34).normal(0, 1, 10_000))
    s2 = KLL.from_bytes(s.to_bytes())
    assert s2.count == s.count
    assert np.array_equal(s2.quantile(QS), s.quantile(QS))


def test_kll_small_input_exact():
    s = KLL(k=200).update(np.arange(100, dtype=float))
    # fewer than k items: no compaction, lower-quantile is exact
    assert float(s.quantile(0.5)) == 49.0
    assert float(s.quantile(0.0)) == 0.0
    assert float(s.quantile(1.0)) == 99.0


# ---------------------------------------------------------------- t-digest

def test_tdigest_rank_error():
    for name, gen in DISTS.items():
        data = gen(np.random.default_rng(41), 100_000)
        s = TDigest(delta=100)
        for chunk in np.array_split(data, 10):
            s.update(chunk)
        for q in QS:
            est = float(s.quantile(q))
            assert abs(exact_rank(data, est) - q) < 0.02, (name, q)


def test_tdigest_merge_rank_error():
    data = DISTS["pareto"](np.random.default_rng(42), 80_000)
    parts = np.array_split(data, 8)
    sketches = [TDigest(delta=100).update(p) for p in parts]
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.merge(s)
    assert acc.count == len(data)
    for q in QS:
        est = float(acc.quantile(q))
        assert abs(exact_rank(data, est) - q) < 0.03, q


def test_tdigest_extremes():
    data = np.random.default_rng(43).uniform(5, 10, 10_000)
    s = TDigest(delta=100).update(data)
    assert float(s.quantile(0.0)) == pytest.approx(data.min())
    assert float(s.quantile(1.0)) == pytest.approx(data.max())
    assert float(s.rank_of(4.0)) == 0.0
    assert float(s.rank_of(11.0)) == 1.0


def test_tdigest_serde_roundtrip():
    s = TDigest(delta=50).update(np.random.default_rng(44).lognormal(0, 1, 20_000))
    s2 = TDigest.from_bytes(s.to_bytes())
    assert s2.count == s.count and s2.vmin == s.vmin and s2.vmax == s.vmax
    assert np.array_equal(s2.quantile(QS), s.quantile(QS))


def test_tdigest_weighted():
    rng = np.random.default_rng(45)
    vals = rng.uniform(0, 100, 1000)
    wts = rng.integers(1, 8, 1000)
    s = TDigest(delta=100).update(vals, wts)
    expanded = np.repeat(vals, wts)
    assert s.count == expanded.size
    for q in (0.25, 0.5, 0.75):
        est = float(s.quantile(q))
        assert abs(exact_rank(expanded, est) - q) < 0.03


def test_bit_length_exact_above_2_53():
    """frexp alone rounds 2^56-1 up across the power-of-two boundary; the
    corrected bit_length_u48 must match int.bit_length everywhere HLL can
    reach (remainders up to 2^(60-p), p >= 4)."""
    import numpy as np

    from ddsketch_spark.core.hashing import bit_length_u48

    probes = [0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 53) - 1, 1 << 53,
              (1 << 53) + 1, (1 << 56) - 1, 1 << 56, (1 << 56) + 1,
              (1 << 60) - 1, (1 << 62) - 1]
    got = bit_length_u48(np.array(probes, dtype=np.int64))
    want = [int(p).bit_length() for p in probes]
    assert got.tolist() == want


# ----------------------------------------------------------- SpaceSaving

from collections import Counter

from ddsketch_spark.core.spacesaving import SpaceSaving


def _zipf_tokens(rng, n, vocab):
    ranks = rng.zipf(1.3, n)
    return [f"tok{min(int(r), vocab)}" for r in ranks]


def _check_invariants(s, truth):
    """(I1)-(I3) from the module docstring, against exact counts."""
    for x, (cnt, err) in s.counters.items():
        t = truth.get(x, 0)
        assert t <= cnt <= t + err, (x, t, cnt, err)
        assert cnt >= s.floor
    for x, t in truth.items():
        if x not in s.counters:
            assert t <= s.floor, (x, t, s.floor)


def test_spacesaving_exact_when_capacity_fits():
    rng = np.random.default_rng(7)
    toks = _zipf_tokens(rng, 5000, 200)
    s = SpaceSaving(1024).update(np.array(toks, dtype=object))
    truth = Counter(toks)
    assert s.floor == 0 and s.total == len(toks)
    assert {x: c[0] for x, c in s.counters.items()} == dict(truth)
    assert all(c[1] == 0 for c in s.counters.values())


def test_spacesaving_bounds_under_eviction():
    rng = np.random.default_rng(8)
    toks = _zipf_tokens(rng, 20000, 5000)
    s = SpaceSaving(64)
    # stream in several batches (exercises the lazy-heap path repeatedly)
    for i in range(0, len(toks), 1500):
        s.update(np.array(toks[i:i + 1500], dtype=object))
    truth = Counter(toks)
    _check_invariants(s, truth)
    assert s.total == len(toks)
    # classic guarantee: floor <= N / capacity for a single stream
    assert s.floor <= len(toks) / 64
    # every item above the floor threshold must be monitored
    for x, t in truth.items():
        if t > s.floor:
            assert x in s.counters


def test_spacesaving_merge_preserves_bounds():
    rng = np.random.default_rng(9)
    streams = [_zipf_tokens(rng, 8000, 3000) for _ in range(4)]
    parts = [SpaceSaving(64).update(np.array(t, dtype=object))
             for t in streams]
    truth = Counter()
    for t in streams:
        truth.update(t)
    # left-fold merge
    acc = SpaceSaving.from_bytes(parts[0].to_bytes())
    for p in parts[1:]:
        acc.merge(p)
    _check_invariants(acc, truth)
    assert acc.total == sum(len(t) for t in streams)
    # tree merge: ((0+1)+(2+3)) must satisfy the same envelope
    l = SpaceSaving.from_bytes(parts[0].to_bytes()).merge(parts[1])
    r = SpaceSaving.from_bytes(parts[2].to_bytes()).merge(parts[3])
    _check_invariants(l.merge(r), truth)


def test_spacesaving_weighted():
    s = SpaceSaving(4)
    s.update(np.array(["a", "b", "a"], dtype=object),
             np.array([5, 2, 3], dtype=np.int64))
    assert s.get("a") == (8, 0) and s.get("b") == (2, 0)
    assert s.total == 10
    with pytest.raises(ValueError, match="positive"):
        s.update(np.array(["c"], dtype=object), np.array([0]))


def test_spacesaving_serde_roundtrip_and_topk():
    rng = np.random.default_rng(10)
    toks = _zipf_tokens(rng, 9000, 2000)
    s = SpaceSaving(128).update(np.array(toks, dtype=object))
    s2 = SpaceSaving.from_bytes(s.to_bytes())
    assert s2 == s
    top = s.topk(10)
    assert len(top) == 10
    cnts = [c for _, c, _ in top]
    assert cnts == sorted(cnts, reverse=True)
    with pytest.raises(ValueError, match="invalid SpaceSaving"):
        SpaceSaving.from_bytes(b"XXXX" + s.to_bytes()[4:])


def test_spacesaving_capacity_mismatch_merge_errors():
    a, b = SpaceSaving(8), SpaceSaving(16)
    with pytest.raises(ValueError, match="different capacities"):
        a.merge(b)


# ------------------------------------------------------------------ KMV

from ddsketch_spark.core.kmv import (
    KMV, intersection_estimate, union_estimate)


def test_kmv_exact_below_capacity_and_set_semantics():
    h = np.array([py_h64(f"u{i}") for i in range(40)] * 3, dtype=np.int64)
    s = KMV(64).update(h)
    assert s.estimate() == 40.0            # duplicates are no-ops
    assert np.array_equal(s.values, np.unique(h))


def test_kmv_estimate_error_bound():
    rng = np.random.default_rng(31)
    for n in (2000, 20000):
        h = np.array([py_h64(f"v{i}") for i in range(n)], dtype=np.int64)
        s = KMV(256).update(h)
        assert abs(s.estimate() - n) / n < 4 / np.sqrt(254), n


def test_kmv_merge_laws_exact():
    """Bottom-k of a set union: merge is exactly associative, commutative,
    idempotent, and equals the direct build — bit-for-bit."""
    h = np.array([py_h64(f"w{i}") for i in range(5000)], dtype=np.int64)
    parts = np.array_split(h, 7)
    sks = [KMV(128).update(p) for p in parts]
    direct = KMV(128).update(h)
    left = sks[0].copy()
    for s in sks[1:]:
        left.merge(s)
    assert left == direct
    right = sks[-1].copy()
    for s in reversed(sks[:-1]):
        right.merge(s)
    assert right == direct
    assert direct.copy().merge(direct) == direct       # idempotent
    with pytest.raises(ValueError, match="different k"):
        KMV(64).merge(KMV(128))


def test_kmv_union_intersection_estimates():
    a_items = [f"a{i}" for i in range(3000)]
    shared = [f"s{i}" for i in range(1500)]
    b_items = [f"b{i}" for i in range(2000)]
    ha = np.array([py_h64(x) for x in a_items + shared], dtype=np.int64)
    hb = np.array([py_h64(x) for x in b_items + shared], dtype=np.int64)
    a = KMV(512).update(ha)
    b = KMV(512).update(hb)
    u = union_estimate(a, b)
    i = intersection_estimate(a, b)
    assert abs(u - 6500) / 6500 < 0.2
    assert abs(i - 1500) / 1500 < 0.35      # rho has ~1/sqrt(k) noise twice
    # inclusion-exclusion coherence
    assert abs((a.estimate() + b.estimate() - i) - u) / u < 0.25


def test_kmv_serde_roundtrip():
    h = np.array([py_h64(f"z{i}") for i in range(900)], dtype=np.int64)
    s = KMV(256).update(h)
    assert KMV.from_bytes(s.to_bytes()) == s
    with pytest.raises(ValueError, match="invalid KMV"):
        KMV.from_bytes(b"XXXX" + s.to_bytes()[4:])
