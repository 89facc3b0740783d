"""Product quantization (PQ) — compressed ANN at 100-TB vector scale.

Brute-force and IVF top-k (operators/similarity.py) keep full float
vectors; at 10^10+ vectors the index must shrink. PQ splits each
d-dim vector into ``m`` subvectors, k-means-quantizes each subspace
to ``k`` centroids, and stores only the m byte-sized codes — a
64-dim float32 vector becomes 8 bytes (32× compression), and query
scoring needs no decompression: the query's distance to every
centroid of every subspace is a tiny (m×k) lookup table, and the
asymmetric distance (ADC) of a database vector is the sum of m table
entries selected by its codes (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

Everything follows the repo's determinism discipline
(operators/clustering.py): no RNG (seeds = first k vectors by id),
fixed-point BIGINT centroid accumulation (partition-order-free),
explicit argmin tie-breaks. The novel Spark shape here is GROUPED
k-means: all m subspaces train in the SAME jobs — subvectors carry a
``sub`` column, assignment joins on it, and the centroid update is
one (sub, cluster)-grain aggregate — so training cost is iterations ×
2 shuffles regardless of m, not m separate k-means runs.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .clustering import SCALE, _quantize_vec

_DIST2 = (
    "aggregate(zip_with({v}, {c}, (x, y) -> (x - y) * (x - y)),"
    " 0D, (acc, w) -> acc + w)"
)


def _subvectors(emb: DataFrame, m: int, vec_col: str) -> DataFrame:
    """(vec_id, sub, v): the m d/m-dim slices of each vector, as one
    exploded table so every subspace shares the same jobs."""
    slices = F.expr(
        f"transform(sequence(0, {m} - 1), i -> struct(i AS sub, "
        f"transform(slice({vec_col}, i * (size({vec_col}) div {m}) + 1, "
        f"size({vec_col}) div {m}), x -> cast(x as double)) AS v))"
    )
    return emb.select("vec_id", F.explode(slices).alias("s")).select(
        "vec_id", F.col("s.sub").alias("sub"), F.col("s.v").alias("v")
    )


def _assign(sub_vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, sub, cluster): nearest centroid within each subspace,
    deterministic (dist2, cid) tie-break."""
    joined = sub_vecs.join(F.broadcast(centroids), "sub").withColumn(
        "dist2", F.expr(_DIST2.format(v="v", c="c"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy("dist2", "cid")
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", "sub", F.col("cid").alias("cluster"))
    )


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the m codebooks; returns (sub, cid, c array<double>).
    Seeds = slices of the first k vectors by vec_id; ``iters`` Lloyd
    iterations with fixed-point updates. All subspaces train in the
    same jobs (grouped k-means — see module docstring)."""
    sv = _subvectors(emb, m, vec_col).persist()
    seed_rows = (
        sv.join(
            sv.select("vec_id").distinct().orderBy("vec_id").limit(k),
            "vec_id",
        )
        .orderBy("vec_id", "sub")
        .collect()
    )
    n_seed_vecs = len({r["vec_id"] for r in seed_rows})
    if n_seed_vecs < k:
        raise ValueError(f"pq_train: k={k} but only {n_seed_vecs} vectors")
    seed_ids = sorted({r["vec_id"] for r in seed_rows})
    cid_of = {vid: i for i, vid in enumerate(seed_ids)}
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(r["sub"], cid_of[r["vec_id"]], r["v"]) for r in seed_rows],
        "sub int, cid int, c array<double>",
    ).select("sub", "cid", F.expr(_quantize_vec("c")).alias("c"))
    dsub = None
    for _ in range(iters - 1):
        assigned = _assign(sv, centroids)
        joined = sv.join(assigned, ["vec_id", "sub"])
        if dsub is None:
            dsub = len(seed_rows[0]["v"])
        sums = joined.groupBy("sub", "cluster").agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    F.floor(F.element_at("v", i) * SCALE).cast("long")
                ).alias(f"s{i}")
                for i in range(1, dsub + 1)
            ],
        )
        new = sums.select(
            "sub",
            F.col("cluster").alias("cid"),
            F.array(
                *[
                    (F.col(f"s{i}") / F.col("n")).cast("long").cast("double")
                    / SCALE
                    for i in range(1, dsub + 1)
                ]
            ).alias("c"),
        )
        # empty clusters keep their previous centroid
        kept = centroids.join(
            new.select("sub", "cid"), ["sub", "cid"], "left_anti"
        )
        centroids = new.unionByName(kept)
    sv.unpersist()
    return centroids


def pq_encode(
    emb: DataFrame, codebooks: DataFrame, m: int, vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, codes array<int>): each vector's per-subspace nearest
    centroid ids, in subspace order — the 1-byte-per-subspace
    compressed representation."""
    assigned = _assign(_subvectors(emb, m, vec_col), codebooks)
    return (
        assigned.groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("sub", "cluster"))
                ),
                lambda s: s["cluster"],
            ).alias("codes")
        )
    )


def pq_adc_topk(
    codes: DataFrame, codebooks: DataFrame, query: list[float], topk: int = 10
) -> DataFrame:
    """Asymmetric-distance top-k: the query is NOT quantized; its
    distance to every (sub, centroid) pair forms an m×k lookup table
    (driver numpy — m·k·(d/m) = d·k flops), and each database vector
    scores as the sum of m table entries picked by its codes — one
    native aggregate over the broadcast flat table, no vector data
    touched. Returns (vec_id, adc_dist2) smallest-first with vec_id
    tie-break."""
    cb = codebooks.collect()
    m = max(r["sub"] for r in cb) + 1
    k = max(r["cid"] for r in cb) + 1
    dsub = len(cb[0]["c"])
    q = np.asarray(query, dtype=np.float64)
    lut = np.full((m, k), np.inf)
    for r in cb:
        qs = q[r["sub"] * dsub : (r["sub"] + 1) * dsub]
        # SEQUENTIAL fold (Python doubles), not numpy .sum(): numpy's
        # pairwise summation tree differs in the last ulp, and these
        # LUT entries must be bit-identical to the sequential
        # zip_with/list_inner_product fold the DuckDB oracle twin
        # replays (ivfpq_oracle_sql) — the same cross-engine float
        # discipline as operators/clustering.py.
        d2 = 0.0
        for a, b in zip(qs, r["c"]):
            d2 += (float(a) - float(b)) * (float(a) - float(b))
        lut[r["sub"], r["cid"]] = d2
    flat = F.array(*[F.lit(float(x)) for x in lut.reshape(-1)])
    # element_at is 1-based in Spark SQL: sub s's code is
    # element_at(codes, s+1); its LUT slot is s*k + code (0-based)
    dist = F.expr(
        f"aggregate(sequence(0, {m} - 1), 0D, (acc, s) -> "
        f"acc + element_at(__lut, s * {k} + element_at(codes, s + 1) + 1))"
    )
    return (
        codes.withColumn("__lut", flat)
        .select("vec_id", dist.alias("adc_dist2"))
        .orderBy("adc_dist2", "vec_id")
        .limit(topk)
    )
