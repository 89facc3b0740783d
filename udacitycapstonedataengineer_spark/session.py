"""SparkSession factory.

Mirrors the reference's ``create_spark_session`` (etl.py:21-27) minus the
sas7bdat package and Hive support, with the settings a large cluster
actually needs: AQE (runtime re-planning, skew-join handling, partition
coalescing), UTC session timezone (deterministic date semantics vs the
DuckDB oracle), and shuffle partitions sized to the parallelism at hand
instead of the 200 default the reference silently used over 3M rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB these are cluster-submit-time settings; the factory exposes
# them so local tests and a real deployment share one code path.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Arrow for the few pandas-UDF operators (minhash, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MB scan splits — keeps partition count sane at large SF.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Never write INT96 timestamps: they carry NO min/max statistics,
    # which silently disables parquet file/row-group skipping on every
    # time predicate — at 100 TB that's full scans of time-series data.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def get_spark(
    app_name: str = "udacitycapstonedataengineer-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` so tests,
    bench, and the driver share one factory; on a real cluster the
    submitter sets master and this arg is left None with
    ``spark.master`` already present.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def pin_oracle_semantics(spark: SparkSession) -> SparkSession:
    """Runtime-settable confs every oracle-compared query depends on.

    The driver owns the SparkSession passed to ``queries()`` callables,
    so we re-pin per call rather than trusting the factory ran.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
