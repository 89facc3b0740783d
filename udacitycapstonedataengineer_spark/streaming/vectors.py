"""Streaming semantic dedup — the micro-batch twin of
``operators/semdedup.semdedup_incremental_pairs``.

An embedding-ingest stream (new documents' vectors landing
continuously) is deduplicated against a standing corpus the same way
the batch incremental path does it, with two streaming-specific
constraints honored:

- **Assignment must be stateless.** The batch path's
  ``kmeans_assign`` uses a row_number window (not allowed on
  streams). Here the fitted centroids — a k×dim table, tiny by
  definition — become a LITERAL expression: per row, an array of
  (dist2, cid) structs is reduced with ``array_min``, whose struct
  ordering (first field, then second) IS the (dist2, cid) argmin
  tie-break. Zero shuffle, zero state: a codegen'd projection.
- **The corpus joins as a static side.** The standing index
  (cluster, vec_id, embedding, norm) is a batch DataFrame (in
  production: the persisted assignment table partitioned by cluster);
  stream-static equi-joins on the cluster id are append-safe, so each
  micro-batch emits exactly its own batch↔corpus near-dup pairs.

``test_streaming.py::test_stream_semdedup_matches_batch_incremental``
pins micro-batch ≡ batch equality end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import cosine_prenorm, norm

_DIST2 = (
    "aggregate(zip_with({v}, {c}, (x, y) -> (x - y) * (x - y)),"
    " 0D, (acc, w) -> acc + w)"
)


def centroid_assign_expr(
    centroid_rows: list, vec_col: str = "v"
) -> Column:
    """Stateless nearest-centroid expression from collected centroid
    rows [(cid, c)]: ``array_min`` over (dist2, cid) structs — the
    same squared-L2 fold and the same (dist2, cid) tie-break as the
    batch ``kmeans_assign`` window, as one whole-stage-codegen
    projection. Centroid count is k (tiny), so the literal expression
    stays small."""
    entries = []
    for r in sorted(centroid_rows, key=lambda r: r["cid"]):
        c = "array(" + ",".join(f"{float(x)!r}D" for x in r["c"]) + ")"
        d2 = _DIST2.format(v=vec_col, c=c)
        entries.append(f"struct({d2} AS dist2, {int(r['cid'])}L AS cid)")
    return F.expr(f"array_min(array({','.join(entries)}))").getField("cid")


def build_corpus_index(
    corpus: DataFrame, corpus_assign: DataFrame
) -> DataFrame:
    """(cluster, corpus_vec_id, e_b, n_b): the static join side — in
    production a table written once per corpus refresh, partitioned by
    cluster so each micro-batch's join prunes to its clusters."""
    return corpus.join(corpus_assign, "vec_id").select(
        "cluster",
        F.col("vec_id").alias("corpus_vec_id"),
        F.col("embedding").alias("e_b"),
        norm("embedding").alias("n_b"),
    )


def stream_semdedup_pairs(
    new_stream: DataFrame,
    corpus_index: DataFrame,
    centroid_rows: list,
    threshold: float = 0.2,
) -> DataFrame:
    """Append-mode stream of (cluster, new_vec_id, corpus_vec_id,
    cosine): each arriving vector is assigned to its standing cell
    (stateless projection) and compared against that cell's corpus
    members only (stream-static equi-join on cluster)."""
    assigned = new_stream.select(
        F.col("vec_id").alias("new_vec_id"),
        F.col("embedding").alias("e_a"),
        norm("embedding").alias("n_a"),
        F.expr(
            "transform(embedding, x -> cast(x as double))"
        ).alias("v"),
    ).withColumn("cluster", centroid_assign_expr(centroid_rows)).drop("v")
    cos = cosine_prenorm("e_a", "e_b", "n_a", "n_b")
    return (
        assigned.join(corpus_index, "cluster")
        .select(
            "cluster", "new_vec_id", "corpus_vec_id", cos.alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )
