"""Driver-contract simulation (the verify skill's surface 1).

Plain SparkSession (NOT the package factory — the driver owns its own
session, so plain-session runs catch conf dependencies); every oracled
query at sf0.01 compared string-wise against its DuckDB oracle.

Usage: python scripts/driver_sim.py [name ...]   # default: all oracled
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("entry rows:", E.entry(spark).count(), flush=True)
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    names = sys.argv[1:] or sorted(osql)
    bad = 0
    for i, name in enumerate(names):
        s = qs[name](spark, sf).toPandas()
        o = con.execute(osql[name]).fetchdf()
        a = (
            s[sorted(s.columns)]
            .astype(str)
            .sort_values(by=sorted(s.columns))
            .reset_index(drop=True)
        )
        b = (
            o[sorted(o.columns)]
            .astype(str)
            .sort_values(by=sorted(o.columns))
            .reset_index(drop=True)
        )
        ok = a.equals(b)
        bad += not ok
        if not ok or len(s) == 0:
            print(
                "MISMATCH" if not ok else "ZERO-ROW", name, len(s), len(o),
                flush=True,
            )
        if (i + 1) % 40 == 0:
            print(f"...{i + 1} checked, {bad} bad", flush=True)
        spark.catalog.clearCache()
        for jrdd in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            jrdd.unpersist()
    print("done, mismatches:", bad, "of", len(names), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
