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
