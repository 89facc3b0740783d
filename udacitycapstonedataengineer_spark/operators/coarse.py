"""Coarse-quantizer-only fit for IVF-PQ governance (VERDICT r10 #3,
landed ahead of the r12 call-site switch).

``ivfpq_index_drift`` and ``ivfpq_rebuild_decision`` call
``ivfpq_build`` and discard the codebooks and the index — paying
``pq_train``'s eager seed collect + training jobs and a residual+index
persist nobody reads (~2-4 s each at sf0.1). Only the coarse
centroids feed ``ivfpq_drift_stats``. This module is the first stage
of ``ivfpq_build`` EXACTLY — same dense 0..nlist-1 seed cids, same
fixed-point sums, same truncating centroid update
((Σ/n) cast long → double / SCALE), same empty-cell retention via the
left_anti union — so the returned centroids are bit-identical to the
build's (pinned by ``test_coarse_fit_equals_ivfpq_build_centroids``).

NOT a drop-in for ``clustering.kmeans_fit``: that trainer seeds cids
from vec_id, uses a non-truncating float update, and drops emptied
clusters — three deliberate differences the oracle CTE generators
mirror per-operator.

Kept out of operators/ivfpq.py this round: editing a shared operator
file forces re-earns the rotation-filled r11 window cannot absorb
(VERDICT r10 #1). r12 switches the two governance queries to this
helper — a 2-query re-earn that fits its window — and may then fold
``ivfpq_build``'s first stage onto this function as a pure refactor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import SCALE, _quantize_vec, kmeans_assign


def ivfpq_coarse_fit(
    emb: DataFrame,
    nlist: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, c array<double>): the frozen coarse quantizer, exactly
    ``ivfpq_build(...)[0]`` without training codebooks or encoding
    the corpus. One persisted double-vector scan + (iters-1)
    assign/re-aggregate rounds; the model is nlist×dim — driver-sized
    at any corpus scale."""
    vectors = emb.select(
        "vec_id",
        F.expr(
            f"transform({vec_col}, x -> cast(x as double))"
        ).alias("v"),
    ).persist()
    seed = vectors.orderBy("vec_id").limit(nlist).collect()
    if len(seed) < nlist:
        raise ValueError(
            f"ivfpq_coarse_fit: nlist={nlist} > {len(seed)} vectors"
        )
    centroids = vectors.sparkSession.createDataFrame(
        [(i, r["v"]) for i, r in enumerate(seed)],
        "cid bigint, c array<double>",
    ).select("cid", F.expr(_quantize_vec("c")).alias("c"))
    dim = len(seed[0]["v"])
    for _ in range(iters - 1):
        assigned = kmeans_assign(vectors, centroids)
        sums = (
            vectors.join(assigned, "vec_id")
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.floor(F.element_at("v", i) * SCALE).cast("long")
                    ).alias(f"s{i}")
                    for i in range(1, dim + 1)
                ],
            )
        )
        new = sums.select(
            F.col("cluster").alias("cid"),
            F.array(
                *[
                    (F.col(f"s{i}") / F.col("n")).cast("long").cast("double")
                    / SCALE
                    for i in range(1, dim + 1)
                ]
            ).alias("c"),
        )
        kept = centroids.join(new.select("cid"), "cid", "left_anti")
        centroids = new.unionByName(kept)
    return centroids.persist()
