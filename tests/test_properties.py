"""Property-based kernel tests (hypothesis): the invariants the reference
guarantees, checked over randomized inputs rather than fixed fixtures —
serde round-trips, merge associativity/commutativity, the alpha
relative-error bound, and weighted==expanded equivalence."""

import numpy as np
from hypothesis import given, settings, strategies as st

from ddsketch_spark.core.ddsketch import DDSketch, union

ALPHAS = st.sampled_from([0.001, 0.01, 0.05, 0.1])


def _values(draw, min_size=1, max_size=400):
    scale = draw(st.sampled_from([1e-3, 1.0, 1e3, 1e8]))
    vals = draw(st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_infinity=False, width=64),
        min_size=min_size, max_size=max_size))
    return np.asarray(vals, dtype=np.float64) * scale


@settings(max_examples=60, deadline=None)
@given(st.data(), ALPHAS)
def test_serde_roundtrip_binary_and_text(data, alpha):
    v = _values(data.draw if hasattr(data, "draw") else data, 1, 300)
    s = DDSketch(alpha, 32768).update(v)
    if s.count == 0:
        return
    assert DDSketch.from_bytes(s.to_bytes()) == s
    assert DDSketch.from_bytes(s.to_bytes()).to_bytes() == s.to_bytes()
    assert DDSketch.from_string(s.to_string()) == s


@settings(max_examples=60, deadline=None)
@given(st.data(), ALPHAS, st.integers(2, 7))
def test_merge_associative_commutative_random(data, alpha, nparts):
    v = _values(data.draw if hasattr(data, "draw") else data, nparts, 500)
    parts = [DDSketch(alpha, 32768).update(c)
             for c in np.array_split(v, nparts)]
    parts = [p for p in parts if p.count > 0]
    if len(parts) < 2:
        return
    left = parts[0].copy()
    for p in parts[1:]:
        left.merge(p)
    right = parts[-1].copy()
    for p in reversed(parts[:-1]):
        right.merge(p)
    assert left.to_bytes() == right.to_bytes()  # bucket-for-bucket
    whole = DDSketch(alpha, 32768).update(v)
    assert left == whole


@settings(max_examples=40, deadline=None)
@given(st.data(), ALPHAS,
       st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_quantile_relative_error_bound_random(data, alpha, q):
    v = np.abs(_values(data.draw if hasattr(data, "draw") else data, 5, 500))
    v = v[v > 0]
    if v.size < 5:
        return
    s = DDSketch(alpha, 32768).update(v)
    est = float(s.quantile(q))
    exact = float(np.quantile(v, q, method="lower"))
    assert abs(est - exact) <= alpha * 1.01 * abs(exact) + 1e-12


@settings(max_examples=40, deadline=None)
@given(st.data(), ALPHAS)
def test_weighted_equals_expanded_random(data, alpha):
    draw = data.draw if hasattr(data, "draw") else data
    v = _values(draw, 1, 80)
    c = np.asarray(
        draw(st.lists(st.integers(1, 9), min_size=len(v), max_size=len(v))),
        dtype=np.int64)
    s_w = DDSketch(alpha, 32768).update(v, c)
    s_e = DDSketch(alpha, 32768).update(np.repeat(v, c))
    assert s_w == s_e and s_w.to_bytes() == s_e.to_bytes()
