"""DuckDB oracle SQL generators mirroring the DDSketch algorithm.

The engine's results are *approximate* relative to exact quantiles but
*deterministic* functions of the data (integer bucket counts + fixed float
expressions). These builders emit ANSI SQL that computes the identical
algorithm — ceil-log-gamma bucketing, cumulative-count walk, representative
value — so the driver's value-hash comparison against DuckDB matches
bit-for-bit. Float-sensitive constants (gamma, multiplier, zero threshold)
are computed in Python and embedded as full-precision literals so both
sides use the same doubles.

Column-name contract: every builder aliases its output columns and the
matching Spark queries alias identically.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

from ddsketch_spark.core.ddsketch import map_index, mapping_params
from ddsketch_spark.core.hashing import (
    H1_BITS, H64_BITS, duckdb_h64, py_positions,
)


def _consts(alpha: float) -> tuple[float, float, float, float]:
    gamma, mult, minidx, _ = mapping_params(alpha)
    rep_factor = 2.0 / (1.0 + gamma)
    return gamma, mult, minidx, rep_factor




def _lit(x: float) -> str:
    """Emit a double literal in scientific notation: DuckDB parses e-notation
    directly as DOUBLE, while plain decimal literals become DECIMAL first and
    the DECIMAL->DOUBLE cast is not correctly rounded."""
    return f"{float(x):.17e}"


def _base_ctes(table: str, value_expr: str, alpha: float,
               keys: Sequence[str], weight_expr: str | None) -> tuple[str, str, str]:
    """Shared CTEs: vals / idx / buckets / totals. Returns (cte_sql,
    key_select_prefix, walk_order)."""
    _, mult, minidx, _ = _consts(alpha)
    keys = list(keys)
    ksel = "".join(f"{k}, " for k in keys)
    kgroup = ", ".join(keys)
    w = f"CAST(COALESCE({weight_expr}, 1) AS BIGINT)" if weight_expr else "CAST(1 AS BIGINT)"
    totals_group = f" GROUP BY {kgroup}" if keys else ""
    cte = f"""
vals AS (
  SELECT {ksel}{value_expr} AS v, {w} AS w
  FROM {table}
  WHERE {value_expr} IS NOT NULL
),
idx AS (
  SELECT {ksel}
         CASE WHEN v > {_lit(minidx)} THEN 2 WHEN v < {_lit(-minidx)} THEN 0 ELSE 1 END AS part,
         CASE WHEN v > {_lit(minidx)} THEN CAST(ceil(ln(v) / ln(2.0) * {_lit(mult)}) AS BIGINT)
              WHEN v < {_lit(-minidx)} THEN CAST(ceil(ln(-v) / ln(2.0) * {_lit(mult)}) AS BIGINT)
              ELSE 0 END AS bidx,
         w
  FROM vals
),
buckets AS (
  SELECT {ksel}part, bidx, CAST(sum(w) AS BIGINT) AS c
  FROM idx GROUP BY {kgroup}{", " if keys else ""}part, bidx
),
totals AS (
  SELECT {ksel}CAST(sum(c) AS BIGINT) AS n FROM buckets{totals_group}
)"""
    walk_order = "part ASC, CASE WHEN part = 0 THEN -bidx ELSE bidx END ASC"
    return cte, ksel, walk_order


def _rep_value(alpha: float) -> str:
    _, mult, _, rep = _consts(alpha)
    return (f"CASE part WHEN 1 THEN 0.0 "
            f"WHEN 0 THEN -(pow(2.0, bidx / {_lit(mult)}) * {_lit(rep)}) "
            f"ELSE pow(2.0, bidx / {_lit(mult)}) * {_lit(rep)} END")


def percentile_sql(table: str, value_expr: str, alpha: float,
                   qs: Sequence[float], keys: Sequence[str] = (),
                   weight_expr: str | None = None) -> str:
    """Rows ``keys..., q, est`` — one row per key per requested quantile."""
    keys = list(keys)
    cte, ksel, order = _base_ctes(table, value_expr, alpha, keys, weight_expr)
    goals = ", ".join(f"({_lit(float(q))})" for q in qs)
    join = f"JOIN totals t USING ({', '.join(keys)})" if keys else "CROSS JOIN totals t"
    kw = "".join(f"w.{k}, " for k in keys)
    part_cols = ", ".join(f"w.{k}" for k in keys)
    part_clause = f"PARTITION BY {part_cols}, g.q" if keys else "PARTITION BY g.q"
    return f"""
WITH {cte},
walked AS (
  SELECT {ksel}part, bidx, c,
         sum(c) OVER ({f"PARTITION BY {', '.join(keys)} " if keys else ""}ORDER BY {order}
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM buckets
),
hits AS (
  SELECT {kw}g.q AS q, {_rep_value(alpha).replace('part', 'w.part').replace('bidx', 'w.bidx')} AS est,
         row_number() OVER ({part_clause}
                            ORDER BY w.part ASC, CASE WHEN w.part = 0 THEN -w.bidx ELSE w.bidx END ASC) AS rn
  FROM walked w {join} CROSS JOIN (VALUES {goals}) g(q)
  WHERE w.cum > g.q * (t.n - 1)
)
SELECT {ksel}q, est FROM hits WHERE rn = 1
"""


def rank_of_sql(table: str, value_expr: str, alpha: float, x: float,
                keys: Sequence[str] = (), weight_expr: str | None = None) -> str:
    """Rows ``keys..., rank`` — mirror of ddsketch_compute_quantiles_of for a
    positive literal x (the bucket index of x is computed in Python)."""
    keys = list(keys)
    _, mult, minidx, _ = _consts(alpha)
    if x <= minidx:
        raise ValueError("rank_of_sql mirrors the positive-x path only")
    ix = int(map_index(np.array([x]), mult)[0])
    cte, ksel, _ = _base_ctes(table, value_expr, alpha, keys, weight_expr)
    kgroup = f" GROUP BY {', '.join(keys)}" if keys else ""
    join = f"USING ({', '.join(keys)})" if keys else "ON TRUE"
    return f"""
WITH {cte},
agg AS (
  SELECT {ksel}
         COALESCE(sum(CASE WHEN part < 2 THEN c
                           WHEN bidx < {ix} THEN c ELSE 0 END), 0)
         + COALESCE(sum(CASE WHEN part = 2 AND bidx = {ix} THEN c ELSE 0 END), 0) // 2 AS cum
  FROM buckets{kgroup}
)
SELECT {ksel}CAST(agg.cum AS DOUBLE) / (t.n - 1) AS rank
FROM agg JOIN totals t {join}
"""


def buckets_sql(table: str, value_expr: str, alpha: float,
                keys: Sequence[str] = (), weight_expr: str | None = None) -> str:
    """Rows ``keys..., sign, bucket_index, cnt`` (integers only — the most
    robust hash-compare form; zero bucket excluded, like ddsketch_buckets)."""
    cte, ksel, _ = _base_ctes(table, value_expr, alpha, keys, weight_expr)
    return f"""
WITH {cte}
SELECT {ksel}CASE WHEN part = 0 THEN -1 ELSE 1 END AS sign,
       bidx AS bucket_index, c AS cnt
FROM buckets WHERE part <> 1
"""


def info_sql(table: str, value_expr: str, alpha: float,
             keys: Sequence[str] = (), weight_expr: str | None = None) -> str:
    """Rows ``keys..., cnt, zero_cnt, neg_buckets, pos_buckets``."""
    keys = list(keys)
    cte, ksel, _ = _base_ctes(table, value_expr, alpha, keys, weight_expr)
    kgroup = f" GROUP BY {', '.join(keys)}" if keys else ""
    return f"""
WITH {cte}
SELECT {ksel}CAST(sum(c) AS BIGINT) AS cnt,
       CAST(COALESCE(sum(CASE WHEN part = 1 THEN c END), 0) AS BIGINT) AS zero_cnt,
       CAST(COALESCE(sum(CASE WHEN part = 0 THEN 1 END), 0) AS BIGINT) AS neg_buckets,
       CAST(COALESCE(sum(CASE WHEN part = 2 THEN 1 END), 0) AS BIGINT) AS pos_buckets
FROM buckets{kgroup}
"""


def trimmed_sql(table: str, value_expr: str, alpha: float, low: float,
                high: float, kind: str, keys: Sequence[str] = (),
                weight_expr: str | None = None) -> str:
    """Rows ``keys..., val`` — mirror of ddsketch_trimmed_agg
    (positive-domain semantics; zero bucket ignored in the walk but counted
    in the low/high thresholds, exactly like the reference)."""
    assert kind in ("sum", "avg")
    keys = list(keys)
    _, mult, _, _ = _consts(alpha)
    cte, ksel, order = _base_ctes(table, value_expr, alpha, keys, weight_expr)
    join = f"JOIN totals t USING ({', '.join(keys)})" if keys else "CROSS JOIN totals t"
    kgroup = f" GROUP BY {', '.join(keys)}" if keys else ""
    final = "fsum(contrib)" if kind == "sum" else "fsum(contrib) / sum(cadd)"
    return f"""
WITH {cte},
ordered AS (
  SELECT {ksel}part, bidx, c,
         sum(c) OVER ({f"PARTITION BY {', '.join(keys)} " if keys else ""}ORDER BY {order}
                      ROWS UNBOUNDED PRECEDING) - c AS done_before
  FROM buckets WHERE part <> 1
),
terms AS (
  SELECT {"".join(f"o.{k}, " for k in keys)}
         exp(ln(2.0) * (o.bidx - 1) / {_lit(mult)}) AS bfrom,
         exp(ln(2.0) * o.bidx / {_lit(mult)}) AS bto,
         least(greatest(0, floor(t.n * {_lit(float(low))}) - o.done_before - 1), o.c) AS cskip,
         o.c, o.done_before,
         ceil(t.n * {_lit(float(high))}) AS count_high
  FROM ordered o {join}
  WHERE o.done_before < ceil(t.n * {_lit(float(high))})
),
contribs AS (
  SELECT {ksel}
         ((bfrom + (cskip * (bto - bfrom)) / c)
          + (bfrom + ((cskip + (c - cskip - greatest(0, done_before + c - count_high))) * (bto - bfrom)) / c)
         ) / 2.0 * (c - cskip - greatest(0, done_before + c - count_high)) AS contrib,
         c - cskip - greatest(0, done_before + c - count_high) AS cadd
  FROM terms
)
SELECT {ksel}{final} AS val FROM contribs{kgroup}
"""

# ---------------------------------------------------------------------------
# sibling sketches: exact SQL mirrors (HLL / count-min / Bloom).
# The sketches are deterministic functions of the input *set/multiset*
# (max / sum / OR over md5-derived positions), so DuckDB can replay the
# identical integer arithmetic and the driver's value-hash compare matches
# bit-for-bit. See ddsketch_spark/core/hashing.py for the shared hash.
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_ndv_sql(table: str, expr: str, p: int = 12,
                keys: Sequence[str] = ()) -> str:
    """Rows ``keys..., ndv_est`` — mirror of core.hll.HLL.estimate().

    The register power sum is computed in *integer* arithmetic (exact,
    order-free) on both sides; only the final division / log are float,
    and the result is rounded to 4 decimals on both sides.
    """
    keys = list(keys)
    m = 1 << p
    Q = H64_BITS - p + 1
    # same evaluation order as HLL.estimate(): ((alpha*m)*m)*2^Q
    C = _hll_alpha(m) * m * m * float(1 << Q)
    ksel = "".join(f"{k}, " for k in keys)
    kgroup = ", ".join(keys)
    regs_group = f"{kgroup}, j" if keys else "j"
    agg_group = f" GROUP BY {kgroup}" if keys else ""
    return f"""
WITH hs AS (
  SELECT {ksel}{duckdb_h64(expr)} AS h FROM {table} WHERE {expr} IS NOT NULL
),
regs AS (
  SELECT {ksel}(h % {m}) AS j,
         max(CASE WHEN (h // {m}) = 0 THEN {Q}
                  ELSE {Q} - length(bin(h // {m})) END) AS rho
  FROM hs GROUP BY {regs_group}
),
agg AS (
  SELECT {ksel}count(*) AS npresent,
         sum((CAST(1 AS BIGINT) << ({Q} - rho))) AS spresent
  FROM regs{agg_group}
),
raws AS (
  SELECT {ksel}({m} - npresent) AS zeros,
         {_lit(C)} / CAST(spresent + ({m} - npresent) * (CAST(1 AS BIGINT) << {Q}) AS DOUBLE) AS raw
  FROM agg
)
SELECT {ksel}round(CASE WHEN raw <= {_lit(2.5 * m)} AND zeros > 0
                        THEN {m} * ln({m} / zeros) ELSE raw END, 4) AS ndv_est
FROM raws
"""


def _double_hash_pos(width: int) -> str:
    """Position expression for stride column ``i`` — mirror of
    core.hashing.positions()."""
    h1 = f"(h % {1 << H1_BITS})"
    h2 = f"(2 * ((h >> {H1_BITS}) % {1 << (H1_BITS - 1)}) + 1)"
    return f"(({h1} + i * {h2}) % {width})"


def cms_freq_sql(table: str, expr: str, depth: int, width: int,
                 probes: Sequence[str]) -> str:
    """Rows ``item, freq`` — mirror of core.cms.CMS.estimate() for literal
    probe values (probe positions precomputed in Python, data side in SQL)."""
    probe_rows = []
    for item in probes:
        for i, p in enumerate(py_positions(str(item), depth, width)):
            probe_rows.append(f"('{item}', {i}, {p})")
    values = ", ".join(probe_rows)
    return f"""
WITH hs AS (
  SELECT {duckdb_h64(expr)} AS h FROM {table} WHERE {expr} IS NOT NULL
),
pos AS (
  SELECT r.i AS i, {_double_hash_pos(width)} AS p
  FROM hs, range({depth}) AS r(i)
),
counters AS (
  SELECT i, p, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY i, p
),
probes(item, i, p) AS (VALUES {values})
SELECT pr.item AS item, CAST(min(COALESCE(c.c, 0)) AS BIGINT) AS freq
FROM probes pr LEFT JOIN counters c ON c.i = pr.i AND c.p = pr.p
GROUP BY pr.item
"""


def bloom_member_sql(table: str, expr: str, nbits: int, k: int,
                     probes: Sequence[str]) -> str:
    """Rows ``item, member`` — mirror of core.bloom.Bloom.contains() for
    literal probes (false positives included: both sides compute the same
    bit positions, so even FP results match exactly)."""
    probe_rows = []
    for item in probes:
        for p in py_positions(str(item), k, nbits):
            probe_rows.append(f"('{item}', {p})")
    values = ", ".join(probe_rows)
    return f"""
WITH hs AS (
  SELECT {duckdb_h64(expr)} AS h FROM {table} WHERE {expr} IS NOT NULL
),
datapos AS (
  SELECT DISTINCT {_double_hash_pos(nbits)} AS p
  FROM hs, range({k}) AS r(i)
),
probes(item, p) AS (VALUES {values})
SELECT pr.item AS item, bool_and(d.p IS NOT NULL) AS member
FROM probes pr LEFT JOIN datapos d ON d.p = pr.p
GROUP BY pr.item
"""


def bound_rows_sql(qs: Sequence[float]) -> str:
    """Rows ``q, ok=TRUE`` — oracle side of the rank-error-bound checks for
    the order-sensitive sketches (KLL / t-digest), whose estimates cannot be
    replayed in SQL (SURVEY §5); the Spark side computes the sketch estimate
    AND verifies its exact rank lies within the bound, so a broken sketch
    yields ok=FALSE and the hash compare fails."""
    rows = ", ".join(f"({_lit(float(q))}, TRUE)" for q in qs)
    return f"SELECT q, ok FROM (VALUES {rows}) t(q, ok)"
