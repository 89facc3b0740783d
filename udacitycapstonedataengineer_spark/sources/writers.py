"""Parquet sinks (SURVEY.md §2.1 S5-S6).

The reference writes every output table with
``df.write.parquet(path, mode='overwrite')`` and partitions the calendar
dim by year/month/week (etl_functions.py:129-130). Partitioned writes are
the scale lever: at 100 TB, a date-partitioned fact enables partition
pruning on every time-sliced read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) parquet table, registered in the
    session catalog at an explicit external ``path``.

    The co-located-join lever at scale: two tables bucketed+sorted on
    the same key with the same bucket count join with NO shuffle and NO
    sort — the physical plan goes straight to SortMergeJoin over the
    pre-clustered files. Worth the write-side shuffle whenever a big
    fact is joined on the same key by many downstream queries."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
