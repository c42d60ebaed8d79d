"""Serialization tests: binary wire layout parity, text format round-trip,
and the reference's 13 malformed-text negative fixtures
(/root/reference/test/sql/ddsketch.sql:2203-2237)."""

import struct

import numpy as np
import pytest

from ddsketch_spark.core.ddsketch import DDSketch


def build(seed=1, n=5000, alpha=0.05, nbuckets=1024, straddle=True):
    rng = np.random.default_rng(seed)
    v = rng.random(n) * 1000
    if straddle:
        v = v - 500
        v[:10] = 0.0  # exercise zero bucket
    return DDSketch(alpha, nbuckets).update(v)


def test_bytes_roundtrip():
    for seed in range(5):
        s = build(seed)
        t = DDSketch.from_bytes(s.to_bytes())
        assert t == s
        assert t.to_bytes() == s.to_bytes()


def test_string_roundtrip():
    for seed in range(5):
        s = build(seed)
        t = DDSketch.from_string(s.to_string())
        assert t == s
        # estimates preserved (test/sql/ddsketch.sql:2150-2201)
        assert np.allclose(t.quantile([0.1, 0.5, 0.9]), s.quantile([0.1, 0.5, 0.9]))


def test_binary_layout_is_reference_wire_format():
    # ddsketch_send layout (ddsketch.c:3013-3027): big-endian
    # int32 flags, int64 count, int64 zero_count, float8 alpha,
    # int32 maxbuckets, int32 nbuckets, int32 nbuckets_negative, buckets...
    s = DDSketch(0.05, 1024).update([-2.0, 0.0, 1.0, 1.0, 3.0])
    b = s.to_bytes()
    flags, count, zero_count, alpha, maxb, nb, nneg = struct.unpack_from(">iqqdiii", b)
    assert (flags, count, zero_count, alpha, maxb) == (0, 5, 1, 0.05, 1024)
    assert nneg == 1 and nb == len(s.neg) + len(s.pos)
    idx0, cnt0 = struct.unpack_from(">iq", b, 40)
    assert cnt0 == 1  # the single negative bucket comes first
    assert len(b) == 40 + 12 * nb


def test_text_format_shape():
    s = DDSketch(0.05, 1024).update([1.0, 1.0, 4.0])
    txt = s.to_string()
    assert txt.startswith("flags 0 count 3 alpha 0.050000 zero_count 0 maxbuckets 1024 buckets")


# Malformed text fixtures, one per reference corruption case
# (test/sql/ddsketch.sql:2205-2237); all must be rejected.
GOOD = DDSketch(0.05, 1024).update([1.0, 2.0, 2.0, 3.0]).to_string()

BAD = [
    # bad flags
    GOOD.replace("flags 0", "flags 1"),
    # negative count
    GOOD.replace("count 4", "count -1", 1),
    # zero_count > count
    GOOD.replace("zero_count 0", "zero_count 100"),
    # negative zero_count
    GOOD.replace("zero_count 0", "zero_count -1"),
    # alpha out of range (low/high)
    GOOD.replace("alpha 0.050000", "alpha 0.000010"),
    GOOD.replace("alpha 0.050000", "alpha 0.500000"),
    # maxbuckets out of range
    GOOD.replace("maxbuckets 1024", "maxbuckets 4"),
    GOOD.replace("maxbuckets 1024", "maxbuckets 100000"),
    # nbuckets_negative > nbuckets
    "flags 0 count 4 alpha 0.050000 zero_count 0 maxbuckets 1024 buckets 1 2 (1, 4)",
    # nbuckets > maxbuckets
    "flags 0 count 4 alpha 0.050000 zero_count 0 maxbuckets 1024 buckets 2000 0 (1, 4)",
    # bucket count zero / negative
    "flags 0 count 4 alpha 0.050000 zero_count 0 maxbuckets 1024 buckets 2 0 (1, 0) (2, 4)",
    "flags 0 count 4 alpha 0.050000 zero_count 0 maxbuckets 1024 buckets 2 0 (1, -2) (2, 6)",
    # positive indexes not ascending
    "flags 0 count 4 alpha 0.050000 zero_count 0 maxbuckets 1024 buckets 2 0 (5, 2) (2, 2)",
    # sum(buckets)+zero_count != count
    "flags 0 count 9 alpha 0.050000 zero_count 0 maxbuckets 1024 buckets 2 0 (1, 2) (2, 2)",
    # garbage
    "not a sketch at all",
]


@pytest.mark.parametrize("bad", BAD)
def test_malformed_text_rejected(bad):
    with pytest.raises(ValueError):
        DDSketch.from_string(bad)


def test_malformed_bytes_rejected():
    s = build()
    b = bytearray(s.to_bytes())
    # corrupt count so the checksum invariant breaks
    b[4:12] = struct.pack(">q", 999999)
    with pytest.raises(ValueError):
        DDSketch.from_bytes(bytes(b))
    with pytest.raises(ValueError):
        DDSketch.from_bytes(b"\x00" * 10)


def test_copy_roundtrip_byte_identical():
    # COPY text & binary round-trip (test/sql/copy.sql:26-38):
    # 100 random sketches, both formats, byte-identical
    rng = np.random.default_rng(42)
    for _ in range(100):
        nb = int(rng.integers(1024, 2049))
        # text format prints alpha with %lf (6 decimals, ddsketch.c:2860) —
        # byte-identity needs a 6-decimal-exact alpha, like the reference test
        alpha = round(float(rng.uniform(0.01, 0.1)), 4)
        n = 5 * nb
        s = DDSketch(alpha, nb).update(rng.random(n) * 10000)
        assert DDSketch.from_bytes(s.to_bytes()).to_bytes() == s.to_bytes()
        assert DDSketch.from_string(s.to_string()).to_bytes() == s.to_bytes()


def test_string_roundtrip_idempotent_for_lossy_alpha():
    # one text round-trip stabilizes even a non-6-decimal alpha
    rng = np.random.default_rng(9)
    s = DDSketch(0.0734291528, 1024).update(rng.random(1000))
    once = DDSketch.from_string(s.to_string())
    twice = DDSketch.from_string(once.to_string())
    assert once.to_string() == twice.to_string()


def test_corruption_fuzz_only_valueerror_escapes():
    """Robustness contract for untrusted sketch bytes/text: any corruption
    either parses into a usable sketch or raises ValueError — never
    struct.error / numpy errors / crashes (25k-trial offline fuzz; a
    smaller deterministic sweep pinned here)."""
    import numpy as np

    rng = np.random.default_rng(5)
    base = DDSketch(0.01, 2048).update(rng.standard_normal(200) * 100)
    raw = base.to_bytes()
    for trial in range(2000):
        b = bytearray(raw)
        kind = trial % 4
        if kind == 0:
            i = rng.integers(0, len(b)); b[i] ^= 1 << rng.integers(0, 8)
        elif kind == 1:
            b = b[:rng.integers(0, len(b))]
        elif kind == 2:
            b = bytes(rng.integers(0, 256, rng.integers(0, 120), dtype=np.uint8))
        else:
            b = bytes(b) + bytes(rng.integers(0, 256, rng.integers(1, 40),
                                              dtype=np.uint8))
        try:
            s = DDSketch.from_bytes(bytes(b))
            s.quantile([0.5]); s.to_bytes()
        except ValueError:
            pass
    text = base.to_string()
    for trial in range(500):
        t = list(text)
        i = rng.integers(0, len(t)); t[i] = chr(rng.integers(32, 127))
        try:
            DDSketch.from_string("".join(t))
        except ValueError:
            pass
