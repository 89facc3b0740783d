"""Small-file compaction — the parquet-lake maintenance primitive.

Streaming sinks (foreachBatch per-batch directories), incremental
appends, and over-parallel writers all accrete small files; at 100 TB
the cost is real (file-listing latency, per-file open overhead, row
groups far below the stats-pruning sweet spot). ``compact_parquet``
rewrites a directory to ~``target_bytes`` files in one narrow job.

Commit discipline (local filesystem variant of the swap pattern the
tokenshard writer uses): the compacted copy is fully written to a
sibling temp directory first, then swapped in with two renames
(old → .pre-compact backup, temp → live) and the backup removed last.
A crash before the first rename leaves the table untouched; between
the renames the table is briefly ABSENT (the documented local-FS
limitation — an object-store/catalog deployment swaps a manifest
pointer instead, which is atomic); after the second rename the new
layout is live and only backup cleanup remains. Leftover temp/backup
directories from a crashed run are detected and cleaned on the next
call.

Ordering: the rewrite uses round-robin ``repartition`` (pure size
bin-packing). For clustered layouts, compact through the layout
writer instead (``zorder.write_zordered`` re-clusters while it
compacts) — compacting a sorted table with this function keeps the
rows and loses the clustering.

Partitioned tables: apply per partition directory (the unit a real
lake compacts incrementally), not across the partition root.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files. Returns accounting:
    {files_before, files_after, bytes_total, rows}."""
    tmp = path.rstrip("/") + ".compact-tmp"
    backup = path.rstrip("/") + ".pre-compact"
    # clean residue of a previously crashed run
    for residue in (tmp, backup):
        if os.path.exists(residue):
            shutil.rmtree(residue)

    parts = glob.glob(os.path.join(path, "*.parquet"))
    if not parts:
        raise FileNotFoundError(f"compact_parquet: no parquet parts in {path}")
    bytes_total = sum(os.path.getsize(p) for p in parts)
    n_out = max(1, -(-bytes_total // target_bytes))

    df = spark.read.parquet(path)
    rows = df.count()
    df.repartition(n_out).write.mode("errorifexists").parquet(tmp)
    # verify the copy before touching the live table
    if spark.read.parquet(tmp).count() != rows:
        shutil.rmtree(tmp)
        raise RuntimeError(
            "compact_parquet: row count changed during rewrite; "
            "source left untouched"
        )
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return {
        "files_before": len(parts),
        "files_after": len(glob.glob(os.path.join(path, "*.parquet"))),
        "bytes_total": bytes_total,
        "rows": rows,
    }


# Compaction POLICY (round 12): ``compact_parquet`` is the mechanism,
# this is the deterministic trigger that decides WHEN — the
# ``kn_compact_due`` discipline applied to file layout. A reader of
# the directory opens every part file; the ideal layout has
# ceil(total_bytes / target_bytes) files, so file_count / ideal is
# the open-overhead amplification appends accumulate. Compacting at
# 2× bounds per-read file opens at twice optimal while keeping
# compaction frequency logarithmic in append count (each compaction
# resets the ratio to ~1, so under steady same-size appends the
# trigger fires when the file count has re-doubled — never per-batch,
# never starved). Purely a function of the directory listing: no
# Spark job runs to decide, and re-deriving on the same snapshot
# always rules the same way (the ``cell_budget.derive_k`` contract).
DEFAULT_MAX_FILE_AMPLIFICATION = 2.0


def compaction_stats(path: str) -> dict:
    """{file_count, bytes_total} for the parquet parts at ``path`` —
    the two numbers the trigger consumes, from the directory listing
    alone."""
    parts = glob.glob(os.path.join(path, "*.parquet"))
    return {
        "file_count": len(parts),
        "bytes_total": sum(os.path.getsize(p) for p in parts),
    }


def compact_due(
    file_count: int,
    bytes_total: int,
    target_bytes: int = 128 << 20,
    max_amplification: float = DEFAULT_MAX_FILE_AMPLIFICATION,
) -> bool:
    """True when the directory holds more than ``max_amplification``×
    the ideal file count for its size. An empty or single-file
    directory is never due; a directory already at the ideal count is
    never due regardless of the multiplier (>= 1 ideal file is the
    floor, so tiny tables stop re-compacting once they reach one
    file)."""
    if file_count <= 1:
        return False
    ideal = max(1, -(-bytes_total // target_bytes))
    return file_count > max_amplification * ideal


def compact_if_due(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    max_amplification: float = DEFAULT_MAX_FILE_AMPLIFICATION,
) -> tuple[bool, dict]:
    """The nightly maintenance entry for append-accreting directories
    (per-cell IVF-PQ index partitions, foreachBatch sink dirs):
    measure from the listing, and only when the trigger fires pay the
    one-narrow-job rewrite. Returns (compacted, stats-as-measured);
    when it fired, the stats dict also carries ``compact_parquet``'s
    accounting under ``"result"``."""
    stats = compaction_stats(path)
    due = compact_due(
        stats["file_count"],
        stats["bytes_total"],
        target_bytes,
        max_amplification,
    )
    if due:
        stats["result"] = compact_parquet(spark, path, target_bytes)
    return due, stats
