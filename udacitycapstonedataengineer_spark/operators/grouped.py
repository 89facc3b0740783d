"""Grouped-map Pandas operators (``applyInPandas``) and their
native scale-safe alternative.

The third Python-surface tier after scalar pandas_udf and mapInPandas:
a whole group arrives as one pandas DataFrame, so cross-row logic that
has no native expression (iterative fits, per-group model scoring,
library calls) can run vectorized per group.

Scale contract: applyInPandas shuffles on the group key and each group
must fit in one executor's PYTHON memory (no spill). That is fine
exactly when the key is MID-cardinality — the group count grows with
the data, so group sizes stay bounded (events per user, docs per
domain). For LOW-cardinality keys (~20 sources at 100 TB → multi-TB
groups) the pandas surface OOMs by construction; use
``median_dev_native`` instead — its window sort spills to disk via
Spark's external sorter, and the median-extraction trick (pick the
middle one/two ranks, average) keeps memory per group O(1).

Both forms keep the math oracle-checkable: medians are
linear-interpolated identically in pandas, Spark avg-of-middle-ranks,
and DuckDB ``median`` on integer inputs, so even the Python path is
hash-verified bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def median_dev_grouped(
    df: DataFrame, key: str, id_col: str, val_col: str
) -> DataFrame:
    """Per-``key`` median of ``val_col`` and each row's deviation —
    the grouped-map shape: the median needs the whole group, the
    output is per-row. Use ONLY with mid-cardinality keys (see module
    docstring); the registered query groups events by user_id."""
    # pass-through field types come from the INPUT schema — hardcoding
    # them by column name silently corrupts any other numeric key
    # (ADVICE r2): applyInPandas casts pandas output to this schema.
    in_types = {f.name: f.dataType for f in df.schema.fields}
    schema = T.StructType(
        [
            T.StructField(id_col, in_types[id_col]),
            T.StructField(key, in_types[key]),
            T.StructField(val_col, in_types[val_col]),
            T.StructField("median_val", T.DoubleType()),
            T.StructField("dev_val", T.DoubleType()),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        med = float(pdf[val_col].median())
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                key: pdf[key],
                val_col: pdf[val_col],
                "median_val": med,
                "dev_val": pdf[val_col].astype("float64") - med,
            }
        )

    return (
        df.select(id_col, key, val_col).groupBy(key).applyInPandas(fit, schema)
    )


def median_dev_native(
    df: DataFrame, key: str, id_col: str, val_col: str
) -> DataFrame:
    """Exact per-``key`` median + per-row deviation with NO unbounded
    group materialization — the low-cardinality-safe form.

    Plan shape: rank rows within each key by value (window sort —
    spill-backed), keep only the middle one/two ranks, average them
    (exact interpolated median), then broadcast the tiny per-key
    median table back onto the rows. Two shuffles on ``key`` + one
    broadcast; every stage is bounded-memory at any group size."""
    w = Window.partitionBy(key).orderBy(val_col)
    ranked = (
        df.select(id_col, key, val_col)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__cnt", F.count(F.lit(1)).over(Window.partitionBy(key)))
    )
    medians = (
        ranked.filter(
            (F.col("__rn") == F.expr("(__cnt + 1) DIV 2"))
            | (F.col("__rn") == F.expr("(__cnt + 2) DIV 2"))
        )
        .groupBy(key)
        .agg(F.avg(val_col).alias("median_val"))
    )
    return (
        df.select(id_col, key, val_col)
        .join(F.broadcast(medians), key)
        .withColumn("dev_val", F.col(val_col) - F.col("median_val"))
        .select(id_col, key, val_col, "median_val", "dev_val")
    )
