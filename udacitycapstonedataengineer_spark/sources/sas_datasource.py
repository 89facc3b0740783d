"""Native ``spark.read.format("sas7bdat")`` via the Python DataSource
API (Spark 4).

The reference relied on a third-party Spark-2 scala package for SAS
ingestion (etl.py:42); no Spark-4 equivalent exists, so this module
IS the Spark-4 reader: a Python DataSource that splits at FILE
granularity (a .sas7bdat is a sequential page chain — not
block-splittable in practice — so one partition per file is the
honest parallel grain, same as ``sas.convert_sas_batch``), streams
each file through the pandas public reader in bounded-memory chunks,
and hands Spark Arrow RecordBatches (zero row-by-row Python cost).

Usage::

    from udacitycapstonedataengineer_spark.sources.sas_datasource import (
        register_sas_datasource,
    )
    register_sas_datasource(spark)
    df = spark.read.format("sas7bdat").load("/data/i94_*.sas7bdat")

Schema comes from the first file (driver-side peek at one chunk);
other files are cast to it, mirroring ``sas.convert_sas_like``'s
normalization (float64 numerics, string text, DATE/TIMESTAMP for
SAS-date-formatted numerics).
"""

from __future__ import annotations

import glob
import os
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .readers import _arrow_field_to_spark
from .sas import _normalize_chunk, day_grain_columns

DEFAULT_CHUNKSIZE = 100_000


def _cast_checked(table, schema, path: str):
    """Cast a per-file table to the pinned driver schema, REFUSING the
    one lossy direction: TIMESTAMP (a DATETIME-formatted column in
    this file) → DATE32 (pinned from a file where the same column is
    DATE-formatted). Arrow performs that cast silently, truncating
    time-of-day (ADVICE r2); date32 → timestamp widening stays fine."""
    import pyarrow as pa

    for field in table.schema:
        target = schema.field(field.name).type
        if pa.types.is_timestamp(field.type) and pa.types.is_date(target):
            raise ValueError(
                f"{path}: column {field.name!r} is DATETIME-formatted but "
                "the pinned schema (from the first file) says DATE — "
                "re-read with consistent files or convert per-file"
            )
    return table.cast(schema)


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.sas7bdat")))
    return sorted(glob.glob(path)) or [path]


def _peek_arrow_schema(path: str, encoding: str):
    import pandas as pd

    reader = pd.read_sas(
        path, format="sas7bdat", chunksize=64, iterator=True, encoding=encoding
    )
    try:
        day_cols = day_grain_columns(reader)
        return _normalize_chunk(next(iter(reader)), day_cols).schema
    finally:
        reader.close()


@dataclass
class _SasFilePartition(InputPartition):
    path: str


class SasDataSource(DataSource):
    """``format("sas7bdat")`` — options: ``path``, ``encoding``
    (default latin-1), ``chunksize`` (rows per Arrow batch)."""

    @classmethod
    def name(cls) -> str:
        return "sas7bdat"

    def schema(self):
        from pyspark.sql import types as T

        files = _expand(self.options["path"])
        arrow_schema = _peek_arrow_schema(
            files[0], self.options.get("encoding", "latin-1")
        )
        fields = []
        for f in arrow_schema:
            dt, _ = _arrow_field_to_spark(f.type)
            fields.append(T.StructField(f.name, dt, True))
        return T.StructType(fields)

    def reader(self, schema) -> "SasDataSourceReader":
        return SasDataSourceReader(self.options, schema)


class SasDataSourceReader(DataSourceReader):
    def __init__(self, options, schema) -> None:
        self.options = options
        self.encoding = options.get("encoding", "latin-1")
        self.chunksize = int(options.get("chunksize", DEFAULT_CHUNKSIZE))
        self.files = _expand(options["path"])
        # pin the arrow schema driver-side so every partition casts to
        # the SAME types regardless of per-file inference quirks
        self.arrow_schema = _peek_arrow_schema(self.files[0], self.encoding)

    def partitions(self):
        # one partition per file: the honest grain for an
        # unsplittable sequential format — N files → N-way parallelism
        return [_SasFilePartition(p) for p in self.files]

    def read(self, partition: _SasFilePartition):
        import pandas as pd

        reader = pd.read_sas(
            partition.path,
            format="sas7bdat",
            chunksize=self.chunksize,
            iterator=True,
            encoding=self.encoding,
        )
        day_cols = day_grain_columns(reader)
        try:
            for chunk in reader:
                yield from _cast_checked(
                    _normalize_chunk(chunk, day_cols),
                    self.arrow_schema,
                    partition.path,
                ).to_batches()
        finally:
            reader.close()


def register_sas_datasource(spark) -> None:
    spark.dataSource.register(SasDataSource)
