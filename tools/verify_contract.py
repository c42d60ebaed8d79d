"""One-command driver-contract verification: runs entry() plus EVERY
catalog query against its DuckDB oracle with the driver's compare
semantics (sort columns by name, sort rows, value-exact) and prints one
line per query plus a summary.

Usage: python tools/verify_contract.py [sf_dir] [master]
       (defaults: /root/testdata/sf0.01, local[16])
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    import duckdb
    import pandas as pd

    from ddsketch_spark.plans.session import get_spark
    import __spark_entry__ as e

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[16]"
    spark = get_spark("verify-contract", master=master, shuffle_partitions=16)
    print("entry():", e.entry(spark).count(), "rows")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    Q, O = e.queries(), e.oracle_sql()
    fails = []
    for name, fn in Q.items():
        try:
            a = canon(fn(spark, sf).toPandas())
            b = canon(con.execute(O[name]).fetchdf())
            ok = (list(a.columns) == list(b.columns) and len(a) == len(b)
                  and all(all(x == y or (pd.isna(x) and pd.isna(y))
                              for x, y in zip(a[c], b[c]))
                          for c in a.columns))
            print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(a)} rows)")
            if not ok:
                fails.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            fails.append(name)
    print(f"\n{len(Q) - len(fails)}/{len(Q)} queries match oracles at {sf}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
