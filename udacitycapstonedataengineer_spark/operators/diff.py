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
