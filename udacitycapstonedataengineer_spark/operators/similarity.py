"""Similarity search over embedding columns (``array<float>``).

Two tiers:
- brute-force cosine top-k: the exactness baseline. The (small) query
  set is broadcast against the candidate scan, so scoring is map-side
  and partition-parallel; only the scored pairs shuffle for per-query
  ranking.
- LSH-bucketed ANN: random-hyperplane signatures assign each vector a
  bucket; search touches only same-bucket candidates. The planes are
  deterministic literals (seeded numpy, rounded), so the DuckDB oracle
  can reproduce the bucketing exactly.

All math is double-precision sequential folds — bit-identical between
Spark's ``aggregate`` and DuckDB's ``list_inner_product`` (verified),
so even cosine scores hash-match without rounding.

At 100 TB: brute-force is O(Q·N) — fine for small Q (dedup probes,
eval queries). For large Q use the LSH path: bucketing is a narrow
map, candidate pairing shuffles on (bucket) only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

COSINE_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
    " / (sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    "          0D, (acc, v) -> acc + v))"
    "    * sqrt(aggregate(transform({b}, x -> cast(x as double) * cast(x as double)),"
    "            0D, (acc, v) -> acc + v)))"
)

_NORM_EXPR = (
    "sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
    " 0D, (acc, v) -> acc + v))"
)

_DOT_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)


def cosine(a: str, b: str) -> F.Column:
    return F.expr(COSINE_EXPR.format(a=a, b=b))


def norm(a: str) -> F.Column:
    """L2 norm as the same sequential fold the inline cosine uses, so
    precomputed-norm cosine is bit-identical to the inline form."""
    return F.expr(_NORM_EXPR.format(a=a))


def cosine_prenorm(a: str, b: str, norm_a: str, norm_b: str) -> F.Column:
    """Cosine with both norms precomputed per vector instead of per
    pair — at k candidates per query this removes 2k of the 3k folds.
    Same double ops in the same order as COSINE_EXPR → same bits."""
    return F.expr(_DOT_EXPR.format(a=a, b=b)) / (F.col(norm_a) * F.col(norm_b))


def cosine_sql(a: str, b: str) -> str:
    """DuckDB twin (same double-precision sequential accumulation)."""
    return (
        f"list_inner_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
        f" / (sqrt(list_inner_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
        f"    * sqrt(list_inner_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))"
    )


def hyperplanes(n_bits: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes, rounded to 6 decimals so the
    literal round-trips identically through Spark and DuckDB parsers."""
    rng = np.random.RandomState(seed)
    return [
        [round(float(x), 6) for x in rng.standard_normal(dim)]
        for _ in range(n_bits)
    ]


def _plane_dot_expr(col: str, plane: list[float]) -> str:
    arr = "array(" + ", ".join(f"{x}D" for x in plane) + ")"
    return (
        f"aggregate(zip_with({col}, {arr}, (x, p) -> cast(x as double) * p),"
        " 0D, (acc, v) -> acc + v)"
    )


def _plane_dot_sql(col: str, plane: list[float]) -> str:
    arr = "[" + ", ".join(str(x) for x in plane) + "]"
    return f"list_inner_product(CAST({col} AS DOUBLE[]), {arr}::DOUBLE[])"


def lsh_bucket(col: str, planes: list[list[float]]) -> F.Column:
    """Signature = sign bits of the plane projections, packed to int."""
    bits = [
        f"(CASE WHEN {_plane_dot_expr(col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return F.expr(" + ".join(bits))


def lsh_bucket_sql(col: str, planes: list[list[float]]) -> str:
    bits = [
        f"(CASE WHEN {_plane_dot_sql(col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return " + ".join(bits)


def brute_force_topk(
    emb: DataFrame,
    query_pred: F.Column,
    k: int = 5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast the query side, score map-side,
    rank per query. Ties broken by candidate id (deterministic).

    ``candidates`` restricts the search to a pre-filtered candidate
    set (same vec_id/embedding schema) — the FILTERED vector-search
    shape: metadata predicates (language, source, license, date)
    prune BEFORE scoring, so selective filters cut scoring cost
    proportionally instead of post-filtering a top-k that may then
    come back short."""
    from pyspark.sql import Window

    q = emb.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm("embedding").alias("q_norm"),
    )
    c = (candidates if candidates is not None else emb).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        norm("embedding").alias("c_norm"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_prenorm("q_emb", "c_emb", "q_norm", "c_norm").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def lsh_topk(
    emb: DataFrame,
    query_pred: F.Column,
    planes: list[list[float]],
    k: int = 5,
) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket — the scale path:
    candidate generation is an equi-join on bucket, not a cross join."""
    from pyspark.sql import Window

    with_b = emb.withColumn("bucket", lsh_bucket("embedding", planes))
    q = with_b.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm("embedding").alias("q_norm"),
        "bucket",
    )
    c = with_b.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        norm("embedding").alias("c_norm"),
        "bucket",
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_prenorm("q_emb", "c_emb", "q_norm", "c_norm").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_assign(emb: DataFrame, centroid_mod: int = 50) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (highest cosine, ties to lowest centroid id).

    Centroids are a deterministic sample (vec_id % centroid_mod == 0) —
    the skeleton of a trained IVF index with the k-means step swapped
    for a reproducible, oracle-checkable selection. At scale: centroids
    broadcast (K ≪ N), assignment is one map-side pass over the corpus,
    and the output (vec_id, cell) is the partition key all probes use.
    """
    from pyspark.sql import Window

    cents = emb.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cent_emb"),
        norm("embedding").alias("cent_norm"),
    )
    # argmax as ONE hash aggregation with map-side partial aggregation
    # (guide §2.3 "aggregate before you shuffle"): max of the struct
    # (cent_cos, -cell, …) IS the (cosine DESC, cell ASC) tie-break the
    # historical row_number window applied — but the window's Exchange
    # carried the K-way-exploded rows (embedding duplicated K times)
    # and paid a per-partition sort; the partial agg reduces each map
    # partition to one candidate row per vec_id before anything moves.
    # The payload columns ride BEHIND the two ordering fields, so they
    # never influence the comparison (-cell is unique per candidate).
    best = (
        emb.select("vec_id", "embedding", norm("embedding").alias("v_norm"))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "cent_cos",
            cosine_prenorm("embedding", "cent_emb", "v_norm", "cent_norm"),
        )
        .groupBy("vec_id")
        .agg(
            F.max(
                F.struct(
                    F.col("cent_cos").alias("cos"),
                    (-F.col("cell")).alias("negcell"),
                    F.col("embedding").alias("embedding"),
                    F.col("v_norm").alias("v_norm"),
                )
            ).alias("b")
        )
    )
    return best.select(
        "vec_id",
        F.col("b.embedding").alias("embedding"),
        F.col("b.v_norm").alias("v_norm"),
        (-F.col("b.negcell")).alias("cell"),
    )


def ivf_topk(
    emb: DataFrame,
    query_pred: F.Column,
    k: int = 5,
    centroid_mod: int = 50,
) -> DataFrame:
    """ANN top-k probing only the query's IVF cell (nprobe=1).

    The scale path for large query sets: after assignment, search is an
    equi-join on cell — work proportional to cell size, not corpus
    size. Recall is bounded by quantization (neighbors in adjacent
    cells are missed); raise nprobe or centroid count to trade cost for
    recall, exactly as production IVF indexes do."""
    from pyspark.sql import Window

    assigned = ivf_assign(emb, centroid_mod).persist()
    q = assigned.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("v_norm").alias("q_norm"),
        "cell",
    )
    c = assigned.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_emb"),
        F.col("v_norm").alias("c_norm"),
        "cell",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_prenorm("q_emb", "c_emb", "q_norm", "c_norm").alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def embedding_near_dups(
    emb: DataFrame, planes: list[list[float]], threshold: float = 0.35
) -> DataFrame:
    """Embedding-cosine near-dup pairs, bucket-restricted (recall bound
    by the LSH bucketing, like all production embedding dedup)."""
    with_b = emb.withColumn("bucket", lsh_bucket("embedding", planes))
    a = with_b.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("e_a"),
        norm("embedding").alias("n_a"),
        "bucket",
    )
    b = with_b.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("e_b"),
        norm("embedding").alias("n_b"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", cosine_prenorm("e_a", "e_b", "n_a", "n_b").alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---- int8 quantization -----------------------------------------------------

# Per-vector symmetric int8 quantization: q_i = round(x_i * 127/max|x|).
# The 100 TB storage/compute lever for ANN — 4× smaller than float32,
# integer dot products. abs/max/one division/one multiply/round are each
# single IEEE ops on identical doubles, so Spark and DuckDB agree bitwise
# (both round halves away from zero).

_MAXABS_EXPR = (
    "aggregate(transform({e}, x -> abs(cast(x as double))),"
    " 0D, (acc, v) -> greatest(acc, v))"
)
_MAXABS_SQL = "list_aggregate(list_transform({e}, x -> abs(x::DOUBLE)), 'max')"


def quantize_int8(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``max_abs`` (double), ``q_csv`` (the int8 codes as a csv
    string — string-typed so the oracle compare is representation-
    stable), and ``qnorm_sq`` (exact integer norm² of the codes).
    Narrow per-row math: no shuffle, scales with input splits."""
    maxabs = F.expr(_MAXABS_EXPR.format(e=vec_col))
    step1 = emb.withColumn("max_abs", maxabs)
    q = F.expr(
        f"CASE WHEN max_abs = 0D THEN transform({vec_col}, x -> 0)"
        f" ELSE transform({vec_col},"
        f"  x -> cast(round(cast(x as double) * (127.0D / max_abs)) as int))"
        f" END"
    )
    step2 = step1.withColumn("q", q)
    return step2.select(
        "vec_id",
        "max_abs",
        F.array_join(F.transform("q", lambda x: x.cast("string")), ",").alias(
            "q_csv"
        ),
        F.expr(
            "aggregate(transform(q, x -> cast(x as bigint) * x),"
            " cast(0 as bigint), (acc, v) -> acc + v)"
        ).alias("qnorm_sq"),
    )


def _int8_codes(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(vec_id, q array<int>, qnorm_sq bigint): the int8 codes as an
    array (the serving representation; ``quantize_int8`` emits the
    csv-string form for oracle display stability)."""
    maxabs = F.expr(_MAXABS_EXPR.format(e=vec_col))
    q = F.expr(
        f"CASE WHEN max_abs = 0D THEN transform({vec_col}, x -> 0)"
        f" ELSE transform({vec_col},"
        f"  x -> cast(round(cast(x as double) * (127.0D / max_abs)) as int))"
        f" END"
    )
    return (
        emb.withColumn("max_abs", maxabs)
        .withColumn("q", q)
        .select(
            "vec_id",
            "q",
            F.expr(
                "aggregate(transform(q, x -> cast(x as bigint) * x),"
                " cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("qnorm_sq"),
        )
    )


def ann_topk_int8(
    emb: DataFrame, query_pred: F.Column, k: int = 5
) -> DataFrame:
    """Cosine top-k over INT8 codes — the compressed serving path:
    per-pair math is one exact BIGINT dot product (the per-vector
    ``max_abs`` scale factors CANCEL in cosine, so the quantized
    cosine is dot/(√qnorm_a·√qnorm_b) with no float rescaling), plus
    two sqrts and one division in a fixed order — portable and
    hash-stable. 4× less IO than float32 scan; the integer dot is the
    SIMD-friendly kernel. Output (query_id, cand_id, qcosine, rank)."""
    codes = _int8_codes(emb)
    qside = codes.filter(query_pred).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("qnorm_sq").alias("na"),
    )
    cside = codes.select(
        F.col("vec_id").alias("cand_id"),
        F.col("q").alias("qb"),
        F.col("qnorm_sq").alias("nb"),
    )
    dot = F.expr(
        "aggregate(zip_with(qa, qb, (x, y) -> cast(x as bigint) * y),"
        " cast(0 as bigint), (acc, v) -> acc + v)"
    )
    qcos = F.col("__dot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcosine"), "cand_id"
    )
    return (
        cside.join(F.broadcast(qside))
        .filter(
            (F.col("query_id") != F.col("cand_id"))
            & (F.col("na") > 0)
            & (F.col("nb") > 0)
        )
        .withColumn("__dot", dot)
        .select("query_id", "cand_id", qcos.alias("qcosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk_int8_sql(k: int = 5, dim: int = 64) -> str:
    """DuckDB twin of :func:`ann_topk_int8` (queries = vec_id < 8)."""
    maxabs = _MAXABS_SQL.format(e="embedding")
    dot = (
        f"CAST(list_aggregate(list_transform(generate_series(1, {dim}),"
        " i -> a.q[i]::BIGINT * b.q[i]), 'sum') AS BIGINT)"
    )
    return f"""
    WITH codes AS (
        SELECT vec_id, q,
               CAST(list_aggregate(list_transform(q, x -> x::BIGINT * x),
                    'sum') AS BIGINT) AS qnorm_sq
        FROM (
            SELECT vec_id,
                   CASE WHEN max_abs = 0
                        THEN list_transform(embedding, x -> 0)
                        ELSE list_transform(embedding,
                             x -> CAST(round(x::DOUBLE * (127.0 / max_abs))
                                  AS INTEGER))
                   END AS q
            FROM (SELECT vec_id, embedding, {maxabs} AS max_abs
                  FROM embeddings)
        )
    )
    SELECT query_id, cand_id, qcosine, rank FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
               CAST({dot} AS DOUBLE)
               / (sqrt(CAST(a.qnorm_sq AS DOUBLE))
                  * sqrt(CAST(b.qnorm_sq AS DOUBLE))) AS qcosine,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY CAST({dot} AS DOUBLE)
                            / (sqrt(CAST(a.qnorm_sq AS DOUBLE))
                               * sqrt(CAST(b.qnorm_sq AS DOUBLE))) DESC,
                            b.vec_id) AS rank
        FROM codes a CROSS JOIN codes b
        WHERE a.vec_id < 8 AND a.vec_id != b.vec_id
          AND a.qnorm_sq > 0 AND b.qnorm_sq > 0
    ) WHERE rank <= {k}
    """


def quantize_int8_sql(vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`quantize_int8` (FROM embeddings)."""
    maxabs = _MAXABS_SQL.format(e=vec_col)
    return f"""
    SELECT vec_id, max_abs,
           array_to_string(q, ',') AS q_csv,
           CAST(list_aggregate(list_transform(q, x -> x::BIGINT * x), 'sum')
                AS BIGINT) AS qnorm_sq
    FROM (
        SELECT vec_id, max_abs,
               CASE WHEN max_abs = 0 THEN list_transform({vec_col}, x -> 0)
                    ELSE list_transform({vec_col},
                         x -> CAST(round(x::DOUBLE * (127.0 / max_abs)) AS INTEGER))
               END AS q
        FROM (SELECT vec_id, {vec_col}, {maxabs} AS max_abs FROM embeddings)
    )
    """


# ---- Gram matrix (PCA/whitening input) -------------------------------------

GRAM_SCHEMA_DDL = "i int, j int, gram bigint"


def gram_matrix_int8(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact integer Gram matrix G[i,j] = Σ_rows q_i·q_j over the
    int8-quantized embeddings — the sufficient statistic for PCA /
    whitening / covariance of an embedding column (the 64×64 eigen
    step is then driver-trivial; the distributed part is this
    aggregate).

    Scale shape: each partition accumulates its d×d partial Gram with
    one numpy ``M.T @ M`` per Arrow batch (C-speed, int64-exact for
    int8 codes up to ~2^46 rows), emits d(d+1)/2 upper-triangle rows,
    and the shuffle carries only O(d²) rows PER PARTITION — never the
    vectors. Quantization rides :func:`quantize_int8`, whose
    round-half-away semantics are proven bit-identical to DuckDB, so
    the whole matrix is hash-oracle-able; accumulating float32
    directly would be order-dependent and unverifiable.
    """
    import numpy as np
    import pandas as pd

    q = quantize_int8(emb, vec_col).select("q_csv")

    def batches(it):
        G = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.array(
                [[int(x) for x in s.split(",")] for s in pdf["q_csv"]],
                dtype=np.int64,
            )
            G = M.T @ M if G is None else G + M.T @ M
        if G is None:
            return
        d = G.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": (iu + 1).astype("int32"),  # 1-based, matching SQL arrays
                "j": (ju + 1).astype("int32"),
                "gram": G[iu, ju],
            }
        )

    from pyspark.sql import functions as _F

    return (
        q.mapInPandas(batches, schema=GRAM_SCHEMA_DDL)
        .groupBy("i", "j")
        .agg(_F.sum("gram").alias("gram"))
    )
