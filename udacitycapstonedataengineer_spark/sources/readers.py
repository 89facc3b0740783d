"""Schema'd scans (SURVEY.md §2.1 S1-S4, S8).

The reference reads everything with ``inferSchema=True`` (etl.py:61,76,92)
— an extra full pass over the CSV and nondeterministic types. Here every
reader takes an explicit ``StructType``; inference is opt-in for
exploration only. The SAS7BDAT source (etl.py:42): a NATIVE
``spark.read.format("sas7bdat")`` lives in ``sas_datasource.py``
(Spark-4 Python DataSource API), with ``sas.convert_sas_like`` /
``sas.convert_sas_batch`` as the convert-once-to-parquet alternative.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.types import StructType

# The driver's TPC-H-ish catalog (TESTDATA.md). Stand-ins for the
# reference tables per FIXTURES.md: lineitem/orders = immigration fact,
# nation/region = country_codes lookup, customer/supplier/part = dim
# sources, events/documents/embeddings = extension surfaces.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4: columnar scan — pushdown + pruning come free from Catalyst."""
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """S2/S3: CSV scan with explicit schema (custom delimiter supported,
    matching the ;-separated demographics source at etl.py:61)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:  # exploration fallback — never the production path
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with corrupt-record quarantine: rows that don't parse
    under the declared schema land intact in ``_corrupt_record``
    instead of aborting the job (FAILFAST) or silently nulling fields.
    The ETL pattern at scale: split the result on
    ``_corrupt_record IS NULL`` — clean rows flow on, bad rows go to a
    quarantine sink with the original text preserved for replay.
    """
    from pyspark.sql import types as T

    quarantined = T.StructType(
        [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(quarantined)
        .csv(path)
    )


def _arrow_field_to_spark(t: pa.DataType) -> tuple[T.DataType, bool]:
    """Map an Arrow type to a Spark type. Returns (type, needs_ns_fix):
    nanosecond timestamps are illegal for Spark's parquet reader
    (PARQUET_TYPE_ILLEGAL), so we read them as raw int64 nanos and
    convert to a microsecond TimestampType natively after the scan."""
    if pa.types.is_timestamp(t):
        if t.unit == "ns":
            return T.LongType(), True
        return T.TimestampType(), False
    if pa.types.is_int64(t):
        return T.LongType(), False
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return T.IntegerType(), False
    if pa.types.is_float64(t):
        return T.DoubleType(), False
    if pa.types.is_float32(t):
        return T.FloatType(), False
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType(), False
    if pa.types.is_boolean(t):
        return T.BooleanType(), False
    if pa.types.is_date(t):
        return T.DateType(), False
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BinaryType(), False
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        inner, fix = _arrow_field_to_spark(t.value_type)
        if fix:
            raise ValueError("nested nanosecond timestamps unsupported")
        return T.ArrayType(inner), False
    raise ValueError(f"unmapped arrow type: {t}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Explicit-schema parquet scan (SURVEY.md §7.3: no inferSchema).

    The schema comes from the parquet footer (driver-side pyarrow read,
    no Spark job), so this works under ANY SparkSession — including the
    driver's — and tolerates TIMESTAMP(NANOS) columns, which Spark's own
    inference rejects. Nanos columns are read as int64 and converted to
    microsecond timestamps with `timestamp_micros(c div 1000)` — a
    codegen-friendly expression, truncating sub-microsecond digits (the
    DuckDB oracle compensates with epoch_us)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        # directory datasets (Spark-written): footer from any part file
        import glob

        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            raise FileNotFoundError(f"no parquet parts under {path}")
        footer = pq.read_schema(parts[0])
    else:
        footer = pq.read_schema(path)
    fields, ns_cols = [], []
    for f in footer:
        dt, needs_fix = _arrow_field_to_spark(f.type)
        fields.append(T.StructField(f.name, dt, True))
        if needs_fix:
            ns_cols.append(f.name)
    df = spark.read.schema(T.StructType(fields)).parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the catalog and register temp views so every query is
    expressible through both the DataFrame and SQL surfaces
    (SURVEY.md §2.9 / §3.3)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def with_ingest_lineage(df: DataFrame, batch_id: str | None = None) -> DataFrame:
    """Audit columns from the scan's hidden ``_metadata`` struct —
    source file, size, mtime — plus an optional batch id. The lineage
    every regulated pipeline wants, at zero cost: ``_metadata`` is
    populated by the file reader itself (no extra IO, no UDF), and the
    columns survive into sinks for replay/blame ("which file produced
    this row?"). Must be applied to a DataFrame that came DIRECTLY
    from a file source."""
    out = df.select(
        "*",
        F.col("_metadata.file_name").alias("_src_file"),
        F.col("_metadata.file_size").alias("_src_bytes"),
        F.col("_metadata.file_modification_time").alias("_src_mtime"),
    )
    if batch_id is not None:
        out = out.withColumn("_batch_id", F.lit(batch_id))
    return out
