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


def _normalize_chunk(pdf: pd.DataFrame) -> pa.Table:
    """Chunk → Arrow with stable types: SAS numerics stay float64
    (SAS has ONE numeric type; integer-looking columns are the
    caller's cast decision, see plans/queries cast_types), text stays
    string, DATE/DATETIME-formatted numerics arrive from the reader as
    datetime64 and land as parquet DATE/TIMESTAMP."""
    out = {}
    for name in pdf.columns:
        s = pdf[name]
        if s.dtype == object:
            out[name] = pa.array(s, type=pa.string())
        elif str(s.dtype).startswith("datetime64"):
            # day-precision SAS dates surface as midnight datetimes;
            # keep calendar dates as DATE to preserve the source grain
            if (s.dropna().dt.normalize() == s.dropna()).all():
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
    writer: pq.ParquetWriter | None = None
    try:
        for chunk in reader:
            table = _normalize_chunk(chunk)
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
