"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_kinds(df: pd.DataFrame) -> dict:
    """Dtype KIND per column (int vs float vs bool vs object): the driver's
    hash surface distinguishes 3 from 3.0, so the replica must too — the
    old int→float64 unification masked exactly the q_dup_spans divergence
    (r5's one red gate)."""
    return {c: df[c].dtype.kind for c in df.columns}


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("float64")  # unify int WIDTHS for compare
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    # default sf0.01: the driver's correctness scale — the golden-parquet
    # oracles (mineru_spark/golden.py) are pinned to it
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    from mineru_spark.pipeline import get_spark
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(got)} rows "
                  f"(no oracle)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        g, e_ = normalize(got), normalize(exp)
        if list(g.columns) != list(e_.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e_.columns)}")
            continue
        kg, ke = dtype_kinds(got), dtype_kinds(exp)
        if kg != ke:
            failures.append(name)
            diff = {c: (kg[c], ke[c]) for c in kg if kg[c] != ke.get(c)}
            print(f"FAIL {name}: dtype kinds differ (spark, oracle): {diff}")
            continue
        if len(g) != len(e_):
            failures.append(name)
            print(f"FAIL {name}: rows {len(g)} vs {len(e_)}")
            continue
        try:
            pd.testing.assert_frame_equal(g, e_, check_dtype=False,
                                          rtol=0, atol=0)
            print(f"PASS {name}: {len(g)} rows")
        except AssertionError as ex:
            failures.append(name)
            msg = str(ex).split("\n")
            print(f"FAIL {name}: values differ: " + " | ".join(msg[:4]))
    spark.stop()
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
