"""CDC-style snapshot diff: classify rows as added / removed / changed
between two versions of a keyed table.

The reference pipeline overwrites its outputs wholesale each run
(etl.py writes mode('overwrite')); a production lake wants to know
WHAT changed between runs — for incremental downstream refresh, audit,
and alerting on unexpected churn. ``snapshot_diff`` is that primitive:
one full-outer join on the key, null-safe column comparison, one
output row per differing key.

Scale: the join shuffles both snapshots on the key once. When
snapshots land as bucketed tables on the key (sources/writers.py::
write_bucketed), the shuffle disappears entirely — diff becomes a
zipper merge of co-located buckets, which is how a daily 100 TB
snapshot pair stays tractable. Compared columns should be projected
before the join (done here) so the shuffle carries only key + compared
values, not full rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """Rows that differ between ``old`` and ``new``.

    Output: key columns, ``change_type`` ('added'|'removed'|'changed'),
    and ``old_<c>`` / ``new_<c>`` for every compared column. Unchanged
    rows are dropped (the common case — keep the diff small). Null-safe
    equality (``<=>``) so NULL→value and value→NULL count as changes.
    """
    keys = list(keys)
    compare = list(compare)
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare]
    ).withColumn("__in_new", F.lit(True))
    joined = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~same, "changed")
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *[f"old_{c}" for c in compare],
            *[f"new_{c}" for c in compare],
        )
    )


def schema_drift(spark, path_old: str, path_new: str) -> DataFrame:
    """Schema drift between two parquet snapshots — the contract check
    an incremental pipeline runs BEFORE touching data: added/removed
    columns and type changes, from the parquet FOOTERS only (pure
    metadata — no data scan, O(files) driver work regardless of table
    size).

    Each path may be a single parquet file OR a Spark-written snapshot
    directory; for a directory every part footer is read and unioned,
    and parts that disagree with each other on a column's type raise
    ``ValueError`` — an intra-snapshot inconsistency is corruption, not
    drift, and comparing against a single arbitrary part would hide it.

    Returns (column, change_type, old_type, new_type); empty = schemas
    agree. Nullability is deliberately not compared — parquet writers
    flip required/optional too freely for it to be a useful signal.
    """
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    def fields(path: str) -> dict[str, str]:
        if os.path.isdir(path):
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                raise ValueError(f"no parquet parts under {path}")
        else:
            parts = [path]
        merged: dict[str, str] = {}
        for part in parts:
            for f in pq.read_schema(part):
                t = str(f.type)
                prev = merged.setdefault(f.name, t)
                if prev != t:
                    raise ValueError(
                        f"snapshot {path} is internally inconsistent: "
                        f"column {f.name} is {prev} in one part and "
                        f"{t} in {os.path.basename(part)}"
                    )
        return merged

    old, new = fields(path_old), fields(path_new)
    rows = []
    for name in sorted(set(old) | set(new)):
        if name not in new:
            rows.append((name, "removed", old[name], None))
        elif name not in old:
            rows.append((name, "added", None, new[name]))
        elif old[name] != new[name]:
            rows.append((name, "type_changed", old[name], new[name]))
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("change_type", T.StringType()),
            T.StructField("old_type", T.StringType()),
            T.StructField("new_type", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
