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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .clustering import SCALE, _quantize_vec


def coarse_argmin(cent_rows, v_col: str = "v") -> Column:
    """struct(cid, d): the nearest frozen centroid for the row's
    ``v_col`` vector — computed as a PER-ROW expression over the
    collected model (``cent_rows`` = [(cid, c array<double>)],
    model-sized: nlist×dim). Replaces ``kmeans_assign``'s
    crossJoin + row_number window for frozen-model consumers: the
    window shuffles nlist·N rows and forces a corpus-grain join-back
    to recover ``v`` — assignment against a frozen model is
    embarrassingly parallel, so at 100 TB the right plan is map-only
    (the shuffle-free plan this returns). Decision-identical to
    ``kmeans_assign``: the same _DIST2 fold (zip_with square-diff,
    sequential 0D sum) per centroid, candidates folded in ascending
    cid order with a strict ``<`` — the first minimum wins, which IS
    the (dist2, cid) tie-break.

    The fold carries only (cid, d) — 16 bytes per candidate — not
    the dim-double centroid array (round-12 review finding: threading
    the full array through every fold step is pure copy cost).
    Consumers that need the winning centroid VECTOR recover it with
    ``centroid_array``'s element_at lookup on the cid, and should
    project the struct (or the cid) in its OWN select step before
    extracting further fields — Catalyst does not common-subexpression
    -eliminate lambda-bearing folds, so two field extractions in one
    projection evaluate the whole fold twice."""
    cents = F.array(
        *[
            F.struct(
                F.lit(int(r["cid"])).cast("long").alias("cid"),
                F.array(*[F.lit(float(x)) for x in r["c"]]).alias("c"),
            )
            for r in sorted(cent_rows, key=lambda r: r["cid"])
        ]
    )
    dists = F.transform(
        cents,
        lambda ctr: F.struct(
            ctr["cid"].alias("cid"),
            F.aggregate(
                F.zip_with(
                    F.col(v_col), ctr["c"], lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, w: acc + w,
            ).alias("d"),
        ),
    )
    return F.aggregate(
        dists,
        F.lit(None).cast("struct<cid:bigint,d:double>"),
        lambda best, x: F.when(
            best.isNull() | (x["d"] < best["d"]), x
        ).otherwise(best),
    )


def centroid_array(cent_rows) -> Column:
    """array<array<double>> literal of the frozen centroids ordered by
    dense cid — ``element_at(centroid_array(m), cid + 1)`` recovers a
    row's winning centroid after ``coarse_argmin`` without the fold
    having to thread the vectors through every step (the
    ``stream_ivfpq_encode`` lookup shape)."""
    cents = sorted(cent_rows, key=lambda r: r["cid"])
    if [int(r["cid"]) for r in cents] != list(range(len(cents))):
        raise ValueError(
            "centroid_array: coarse cids must be dense 0..nlist-1"
        )
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in r["c"]]) for r in cents]
    )


def ivfpq_coarse_fit(
    emb: DataFrame,
    nlist: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, c array<double>): the frozen coarse quantizer, exactly
    ``ivfpq_build(...)[0]`` without training codebooks or encoding
    the corpus. One persisted double-vector scan + (iters-1)
    map-only assign/re-aggregate rounds (``coarse_argmin`` — the
    round's centroids are already model-sized, so each round collects
    them and assigns per-row with NO shuffle before the cluster-grain
    sums); the model is nlist×dim — driver-sized at any corpus
    scale. Centroids stay bit-identical to the crossJoin+window path
    (same distance fold, same tie-break, and the fixed-point sums are
    order-free BIGINTs) — pinned by
    ``test_coarse_fit_equals_ivfpq_build_centroids``."""
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
        cent_rows = centroids.collect()
        sums = (
            vectors.select(
                "v", coarse_argmin(cent_rows)["cid"].alias("cluster")
            )
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
