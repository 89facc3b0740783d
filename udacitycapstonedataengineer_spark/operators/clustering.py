"""Distributed k-means (Lloyd's) — bit-reproducible and oracle-checkable.

The interesting problem at cluster scale isn't the algorithm, it's
DETERMINISM: naive double-precision centroid averaging makes results
depend on partition/merge order, so two runs of the "same" clustering
disagree. This implementation removes every order-dependence:

- init: centroids = the first K vectors by id (no RNG);
- assignment: squared-L2 as the same sequential double fold the ANN
  cosine operators use (bit-identical in DuckDB's list_inner_product),
  argmin with an explicit (dist, cluster_id) tie-break;
- update: FIXED-POINT accumulation — each coordinate is floor-quantized
  to an integer (x → ⌊x·2²⁰⌋, exact: inputs are float32 scaled by a
  power of two), summed as BIGINT (exact, commutative — immune to
  partition order), and divided back once. floor (not round) because
  floor has identical semantics in every engine while round's
  half-boundary rule differs.

Scale shape per iteration: one broadcast of K·dim centroid literals,
one narrow crossJoin (K small), one shuffle for the argmin window on
vec_id, one shuffle for the centroid re-aggregation. No driver-side
data movement beyond the K×dim centroid table itself — the same
collect-and-broadcast loop any distributed Lloyd's performs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1 << 20  # fixed-point quantum for centroid accumulation

_DIST2 = (
    "aggregate(zip_with({v}, {c}, (x, y) -> (x - y) * (x - y)),"
    " 0D, (acc, w) -> acc + w)"
)


def _as_double_vec(emb: DataFrame, vec_col: str) -> DataFrame:
    return emb.select(
        "vec_id",
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )


def _quantize_vec(col: str) -> str:
    # exact for float32 inputs: x·2^20 is a power-of-two scaling
    return f"transform({col}, x -> CAST(FLOOR(x * {SCALE}) AS DOUBLE) / {SCALE})"


def kmeans_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cluster): nearest centroid by squared-L2 with a
    deterministic (dist, cid) tie-break."""
    joined = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "dist2", F.expr(_DIST2.format(v="v", c="c"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "cid")
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("vec_id", F.col("cid").alias("cluster"))
    )


def kmeans(
    emb: DataFrame, k: int = 8, iters: int = 2, vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Lloyd's for ``iters`` iterations; returns final (vec_id,
    cluster). Deterministic on any cluster layout (see module doc)."""
    vectors, centroids = kmeans_fit(emb, k, iters, vec_col, dim)
    return kmeans_assign(vectors, centroids)


def kmeans_fit(
    emb: DataFrame, k: int = 8, iters: int = 2, vec_col: str = "embedding",
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The trainer behind ``kmeans``, returning (vectors, centroids)
    so the fitted model is REUSABLE: incremental pipelines (e.g.
    ``semdedup.semdedup_incremental_pairs``) assign NEW batches to the
    standing centroids without re-clustering the corpus — the model
    is a k×dim table, the natural thing to persist between runs."""
    # persisted: consumed by the seed fetch, every iteration's
    # assign + re-aggregation join, and the final assign — without it
    # each consumer re-scans (and re-decodes) the embedding parquet
    vectors = _as_double_vec(emb, vec_col).persist()
    # init = first k vectors by id RANK (not `vec_id < k`, which
    # silently under-seeds on sparse/offset ids — ADVICE r2). One
    # driver action fetches the k×dim seed table, validates the
    # contract, and infers dim — K·dim doubles, trivial at any scale.
    seed = vectors.orderBy("vec_id").limit(k).collect()
    if len(seed) < k:
        raise ValueError(
            f"kmeans: k={k} but only {len(seed)} input vectors"
        )
    if dim is None:
        dim = len(seed[0]["v"])
    centroids = vectors.sparkSession.createDataFrame(
        [(r["vec_id"], r["v"]) for r in seed],
        "cid bigint, c array<double>",
    ).select("cid", F.expr(_quantize_vec("c")).alias("c"))
    for _ in range(iters - 1):
        assigned = kmeans_assign(vectors, centroids)
        # fixed-point per-dimension sums: exact BIGINTs, order-free
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
        centroids = sums.select(
            F.col("cluster").alias("cid"),
            F.array(
                *[
                    (F.col(f"s{i}").cast("double") / F.col("n")) / SCALE
                    for i in range(1, dim + 1)
                ]
            ).alias("c"),
        )
    return vectors, centroids


def _kmeans_dist_sql(dim: int, v: str = "e.v", c: str = "c.c") -> str:
    return (
        "list_inner_product("
        f"list_transform(generate_series(1, {dim}), i -> {v}[i] - {c}[i]),"
        f"list_transform(generate_series(1, {dim}), i -> {v}[i] - {c}[i]))"
    )


def kmeans_oracle_parts(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    table: str = "embeddings",
    fit_where: str = "",
    k_sql: str | None = None,
) -> tuple[list[str], str]:
    """The unrolled-iteration CTE list behind ``kmeans_oracle_sql``,
    reusable by oracles that COMPOSE on a fitted model (SemDeDup,
    incremental assignment). Returns (parts, final_centroid_cte):
    ``e`` = all vectors of ``table`` as DOUBLE[], ``ef`` = the fit
    subset (``fit_where`` filters it; empty = fit on everything —
    identical to plain kmeans), training runs on ``ef`` only.

    ``k_sql`` (the cell-budget policy, VERDICT r13 next #6): a SQL
    scalar subquery replacing the literal ``k`` in the seed LIMIT, so
    the oracle DERIVES k from the data exactly like
    ``cell_budget.derive_k`` does Spark-side. Only the seed count
    depends on k — centroids are relational rows throughout, so a
    data-dependent k needs no structural change. Default None keeps
    the emitted SQL byte-identical to the pre-r14 text (registered
    oracles must not drift)."""
    dist = _kmeans_dist_sql(dim)
    w = f" WHERE {fit_where}" if fit_where else ""
    lim = k_sql if k_sql is not None else str(k)
    parts = [
        f"e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table})",
        f"ef AS (SELECT * FROM e{w})",
        f"""c0 AS (SELECT vec_id AS cid,
               list_transform(v, x -> CAST(FLOOR(x * {SCALE}) AS DOUBLE) / {SCALE}) AS c
        FROM ef ORDER BY vec_id LIMIT {lim})""",
    ]
    prev = "c0"
    for it in range(1, iters):
        parts.append(
            f"""a{it} AS (SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                                          ORDER BY {dist}, c.cid) AS rn
                FROM ef e CROSS JOIN {prev} c) WHERE rn = 1)"""
        )
        parts.append(
            f"""c{it} AS (SELECT cid,
                   list((CAST(s AS DOUBLE) / n) / {SCALE} ORDER BY d) AS c
            FROM (SELECT a.cid, ds.d,
                         SUM(CAST(FLOOR(e.v[ds.d] * {SCALE}) AS BIGINT)) AS s,
                         count(*) AS n
                  FROM ef e JOIN a{it} a USING (vec_id)
                  CROSS JOIN (SELECT unnest(generate_series(1, {dim})) AS d) ds
                  GROUP BY a.cid, ds.d)
            GROUP BY cid)"""
        )
        prev = f"c{it}"
    return parts, prev


def kmeans_assign_sql(dim: int, src_cte: str, cent_cte: str) -> str:
    """Assignment subquery: nearest ``cent_cte`` centroid for every
    row of ``src_cte`` — the SQL twin of ``kmeans_assign``."""
    dist = _kmeans_dist_sql(dim)
    return f"""(SELECT vec_id, cid AS cluster FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist}, c.cid) AS rn
        FROM {src_cte} e CROSS JOIN {cent_cte} c) WHERE rn = 1)"""


def kmeans_oracle_sql(
    k: int = 8, iters: int = 2, dim: int = 64, table: str = "embeddings",
    k_sql: str | None = None,
) -> str:
    """DuckDB twin: the same iterations unrolled as CTEs, same
    fixed-point update, same fold order (list_inner_product of the
    per-dim diff list ≡ the sequential zip_with fold)."""
    parts, prev = kmeans_oracle_parts(
        k=k, iters=iters, dim=dim, table=table, k_sql=k_sql
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT * FROM "
        + kmeans_assign_sql(dim, "e", prev)
        + " t"
    )
