"""Local replica of the driver's correctness gate.

Runs a registered query through Spark AND its oracle SQL through DuckDB
on the same parquet, then compares row count, column names, and values
order-insensitively. Floats must match EXACTLY — the driver hashes
values, so any query whose floats drift must be redesigned (see
functions/exact.py), not tolerated here.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from udacitycapstonedataengineer_spark.plans.queries import ORACLE, QUERIES
from udacitycapstonedataengineer_spark.sources.readers import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def compare_frames(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: columns differ: {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    # dtype-CLASS parity (round 15): the driver compares stringified
    # values, so an int column on one side and a float on the other
    # ("449" vs "449.0") hash-fails there — while the elementwise
    # x == y below would happily pass 0 == 0.0. The classic source is
    # a DuckDB SUM(BIGINT) returning HUGEINT (pandas float64) that the
    # oracle forgot to CAST back; fail it HERE, where staging catches
    # it, not at the driver gate.
    for col in spark_df.columns:
        fa = pd.api.types.is_float_dtype(spark_df[col])
        fb = pd.api.types.is_float_dtype(oracle_df[col])
        assert fa == fb, (
            f"{name}.{col}: float-ness differs (spark "
            f"{spark_df[col].dtype} vs oracle {oracle_df[col].dtype}) — "
            "the driver's string compare will mismatch; CAST the oracle"
        )
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}"
    )
    a, b = _normalize(spark_df), _normalize(oracle_df)
    for col in a.columns:
        for i, (x, y) in enumerate(zip(a[col], b[col])):
            if x is None and y is None:
                continue
            fx = isinstance(x, float) and math.isnan(x)
            fy = isinstance(y, float) and math.isnan(y)
            if (x is None or fx) and (y is None or fy):
                continue
            if isinstance(x, float) or isinstance(y, float):
                assert x == y, (
                    f"{name}.{col}[{i}]: {x!r} != {y!r} (diff={float(x) - float(y):g})"
                )
            else:
                assert str(x) == str(y), f"{name}.{col}[{i}]: {x!r} != {y!r}"


def assert_parity(spark, name: str, sf_dir: str) -> None:
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(ORACLE[name], sf_dir)
    compare_frames(spark_pdf, oracle_pdf, name)
