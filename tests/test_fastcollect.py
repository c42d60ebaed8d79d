"""Fast Arrow-backed collect (plans/fastcollect.py): the rows returned
must be indistinguishable from classic ``DataFrame.collect()``'s — same
values, Python types, order, Row behaviour — with the pickle path used
verbatim whenever the schema contains a type whose Arrow conversion
could differ."""

import datetime

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

from ddsketch_spark.plans.fastcollect import (
    FastCollectDataFrame, _fast_schema_ok, fast_collect,
)


def _both(df):
    fast = fast_collect(df)
    return fast.collect(), ClassicDF(df._jdf, df.sparkSession).collect()


def _same(x, y):
    if isinstance(x, float) and isinstance(y, float):
        return (x != x and y != y) or x == y      # NaN == NaN here
    if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
        return len(x) == len(y) and all(_same(a, b) for a, b in zip(x, y))
    return x == y


def _assert_identical(rows_fast, rows_ref):
    assert len(rows_fast) == len(rows_ref)
    for rf, rr in zip(rows_fast, rows_ref):
        assert isinstance(rf, Row)
        assert _same(tuple(rf), tuple(rr))
        assert [type(x) for x in rf] == [type(x) for x in rr]
        assert repr(rf) == repr(rr)
        assert list(rf.asDict()) == list(rr.asDict())


def test_simple_types_identical(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "x", True, [1, 2], 1.5),
         (2, float("nan"), None, False, [], None),
         (None, None, "y", None, None, 3.25)],
        "a bigint, b double, s string, f boolean, arr array<bigint>, fl double")
    assert _fast_schema_ok(df.schema)
    rows_fast, rows_ref = _both(df)
    _assert_identical(rows_fast, rows_ref)
    # NaN survives as nan (not None), nulls as None
    assert rows_fast[1].b != rows_fast[1].b
    assert rows_fast[1].s is None


def test_int_and_float_widths(spark):
    df = spark.range(3).select(
        F.col("id").cast("int").alias("i"),
        F.col("id").cast("smallint").alias("si"),
        F.col("id").cast("tinyint").alias("ti"),
        (F.col("id") + 0.5).cast("float").alias("f32"))
    assert _fast_schema_ok(df.schema)
    rows_fast, rows_ref = _both(df)
    _assert_identical(rows_fast, rows_ref)


@pytest.mark.parametrize("schema_sql,value", [
    ("ts timestamp", datetime.datetime(2031, 1, 2, 3, 4, 5)),
    ("d date", datetime.date(2031, 1, 2)),
    ("b binary", bytearray(b"abc")),
    ("dec decimal(10,2)", None),
])
def test_unsafe_schemas_fall_back(spark, schema_sql, value):
    df = spark.createDataFrame([(value,)], schema_sql)
    assert not _fast_schema_ok(df.schema)
    rows_fast, rows_ref = _both(df)
    _assert_identical(rows_fast, rows_ref)


def test_struct_falls_back(spark):
    df = spark.range(2).select(F.struct("id").alias("st"))
    assert not _fast_schema_ok(df.schema)
    rows_fast, rows_ref = _both(df)
    _assert_identical(rows_fast, rows_ref)


def test_empty_result(spark):
    df = spark.range(5).where("id < 0")
    assert fast_collect(df).collect() == []


def test_row_order_preserved(spark):
    df = spark.range(0, 10000, 1, 8).select(F.col("id"))
    rows_fast, rows_ref = _both(df)
    assert [r.id for r in rows_fast] == [r.id for r in rows_ref]


def test_queries_are_wrapped(spark):
    from ddsketch_spark.queries import QUERIES
    df = QUERIES["dd_info_price"](spark, "/root/testdata/sf0.001")
    assert isinstance(df, FastCollectDataFrame)


def test_failing_stock_collect_runs_once(spark, monkeypatch):
    """A non-fast-schema query whose stock collect FAILS must fail once:
    the fallback branch lives outside the try so the exception propagates
    instead of triggering a second full execution of the failing plan."""
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    calls = {"n": 0}
    orig = ClassicDF.collect

    def counting_collect(self):
        calls["n"] += 1
        raise RuntimeError("boom")

    # binary column -> non-fast schema -> stock path
    df = fast_collect(spark.range(1).select(
        F.col("id").cast("string").cast("binary").alias("b")))
    assert not _fast_schema_ok(df.schema)
    monkeypatch.setattr(ClassicDF, "collect", counting_collect)
    try:
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="boom"):
            df.collect()
    finally:
        monkeypatch.setattr(ClassicDF, "collect", orig)
    assert calls["n"] == 1
