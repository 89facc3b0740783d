"""SAS7BDAT ingestion (SURVEY.md §2.1 S1).

The reference's primary source is a SAS7BDAT read via a third-party
Spark-2 package (reference etl.py:42,
``spark.read.format('com.github.saurfang.sas.spark')``). No maintained
Spark-4 datasource exists for SAS7BDAT, and the format itself is a
sequential, page-chained binary — not block-splittable in practice —
so the Spark-first design converts ONCE at the edge to parquet and
keeps every engine path columnar:

- ``convert_sas_like``: one file → parquet, streaming chunks through
  pandas' public SAS7BDAT reader (never materializes the whole file;
  a 10 GB .sas7bdat converts in bounded memory).
- ``convert_sas_batch``: many files → parquet IN PARALLEL on the
  cluster. File-level parallelism is the right grain for an
  unsplittable format: each task converts whole files, so a 100 TB
  monthly drop (the reference's i94 data is one file per month)
  converts with one task per file and zero shuffle.

After conversion, reads go through ``readers.load_table`` and get
predicate pushdown, column pruning, and stable schemas for free.
"""

from __future__ import annotations

import os
from typing import Iterable

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession


# SAS day-grain display formats (public: SAS format documentation;
# the same family pandas' SAS7BDATReader converts with unit='d').
# Fallback only — when pandas exposes its own authoritative list we
# import it so our DATE/TIMESTAMP split matches pandas' conversion
# exactly.
_DAY_FORMATS_FALLBACK = frozenset(
    {
        "DATE", "DAY", "DDMMYY", "MMDDYY", "YYMMDD", "JULIAN", "JULDAY",
        "MONYY", "YYMON", "MONTH", "YEAR", "QTR", "WEEKDATE", "WEEKDATX",
        "WEEKDAY", "WEEKV", "WORDDATE", "WORDDATX", "MONNAME", "DOWNAME",
        "E8601DA", "B8601DA", "MINGUO", "NENGO", "YYQ", "YYMM",
    }
)


def _day_format_names() -> frozenset[str]:
    try:  # pandas' own list — the exact set it converts at day grain
        from pandas.io.sas.sas_constants import sas_date_formats

        return frozenset(sas_date_formats)
    except Exception:
        return _DAY_FORMATS_FALLBACK


def day_grain_columns(reader) -> set[str]:
    """Column names the SAS file declares with a DAY-grain display
    format. The TYPE decision (parquet DATE vs TIMESTAMP) comes from
    this header metadata, never from sampled values: an all-midnight
    first chunk must NOT pin a DATETIME column to DATE and silently
    truncate later time-of-day values (ADVICE r2)."""
    day_formats = _day_format_names()
    out: set[str] = set()
    for col in getattr(reader, "columns", []):
        name = col.name
        if isinstance(name, bytes):
            name = name.decode("latin-1")
        fmt = col.format or ""
        if isinstance(fmt, bytes):
            fmt = fmt.decode("ascii", "ignore")
        if fmt.upper().rstrip("0123456789.") in day_formats:
            out.add(name)
    return out


def _normalize_chunk(pdf: pd.DataFrame, day_cols: set[str] | None = None) -> pa.Table:
    """Chunk → Arrow with stable types: SAS numerics stay float64
    (SAS has ONE numeric type; integer-looking columns are the
    caller's cast decision, see plans/queries cast_types), text stays
    string, DATE/DATETIME-formatted numerics arrive from the reader as
    datetime64 and land as parquet DATE (day-grain format per the
    file header — ``day_cols``) or TIMESTAMP (everything else)."""
    day_cols = day_cols or set()
    out = {}
    for name in pdf.columns:
        s = pdf[name]
        if s.dtype == object:
            out[name] = pa.array(s, type=pa.string())
        elif str(s.dtype).startswith("datetime64"):
            if name in day_cols:
                out[name] = pa.array(s.dt.date, type=pa.date32())
            else:
                out[name] = pa.array(s.astype("datetime64[us]"))
        else:
            out[name] = pa.array(s.astype("float64"), type=pa.float64())
    return pa.table(out)


def convert_sas_like(
    sas_path: str,
    out_path: str,
    chunksize: int = 100_000,
    encoding: str = "latin-1",
) -> str:
    """One-time SAS7BDAT → parquet conversion (S1). Streams
    ``chunksize`` rows at a time through ``pandas.read_sas`` into a
    single parquet file via one ParquetWriter — bounded memory, one
    row group per chunk (row groups keep predicate pushdown effective
    on the converted file). Returns ``out_path``.
    """
    reader = pd.read_sas(
        sas_path, format="sas7bdat", chunksize=chunksize, iterator=True,
        encoding=encoding,
    )
    day_cols = day_grain_columns(reader)
    writer: pq.ParquetWriter | None = None
    try:
        for chunk in reader:
            table = _normalize_chunk(chunk, day_cols)
            if writer is None:
                writer = pq.ParquetWriter(out_path, table.schema)
            else:
                table = table.cast(writer.schema)
            writer.write_table(table)
    finally:
        if writer is not None:
            writer.close()
        reader.close()
    if writer is None:
        raise ValueError(f"no rows read from {sas_path}")
    return out_path


def convert_sas_batch(
    spark: SparkSession,
    sas_paths: Iterable[str],
    out_dir: str,
    chunksize: int = 100_000,
    encoding: str = "latin-1",
) -> list[str]:
    """Cluster-parallel conversion: one task per .sas7bdat file.

    The file list is parallelized with one partition per file and each
    executor streams its file to ``<out_dir>/<stem>.parquet`` (shared
    filesystem / object store). This is the 100 TB path: conversion
    throughput scales with executor count because the per-file work is
    independent — no shuffle, no driver data movement. Returns the
    output paths (driver collects only paths, never data)."""
    paths = list(sas_paths)
    if not paths:
        return []
    os.makedirs(out_dir, exist_ok=True)

    def _convert(path: str) -> str:
        stem = os.path.splitext(os.path.basename(path))[0]
        return convert_sas_like(
            path, os.path.join(out_dir, f"{stem}.parquet"),
            chunksize=chunksize, encoding=encoding,
        )

    return (
        spark.sparkContext.parallelize(paths, len(paths)).map(_convert).collect()
    )


def read_sas_converted(spark: SparkSession, out_path: str) -> DataFrame:
    """Scan a converted file with the footer-derived explicit schema
    (same TIMESTAMP(NANOS)-safe path as every other engine scan)."""
    from .readers import load_table

    return load_table(spark, os.path.dirname(out_path),
                      os.path.splitext(os.path.basename(out_path))[0])
