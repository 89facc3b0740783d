"""Similarity-search queries over ``embeddings`` — all oracle-checked,
including the LSH path (the hyperplanes are deterministic literals
reproduced inside the oracle SQL)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.clustering import kmeans, kmeans_oracle_sql
from ..operators.similarity import (
    brute_force_topk,
    cosine_sql,
    embedding_near_dups,
    hyperplanes,
    ivf_topk,
    lsh_bucket_sql,
    lsh_topk,
)
from .registry import query

_PLANES = hyperplanes(n_bits=4, dim=64)


def _q_pred():
    return F.col("vec_id") < 8


def _topk_oracle(candidate_join: str) -> str:
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb{_BUCKET_Q} FROM embeddings
               WHERE vec_id < 8),
         c AS (SELECT vec_id AS cand_id, embedding AS c_emb{_BUCKET_C} FROM embeddings),
         scored AS (
            SELECT query_id, cand_id, {cosine_sql('q_emb', 'c_emb')} AS cosine
            FROM c {candidate_join}
            WHERE query_id <> cand_id
         )
    SELECT query_id, cand_id, cosine, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """


_BUCKET_Q = f", {lsh_bucket_sql('embedding', _PLANES)} AS bucket"
_BUCKET_C = _BUCKET_Q


@query(
    "ann_topk_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
               WHERE vec_id < 8),
         c AS (SELECT vec_id AS cand_id, embedding AS c_emb FROM embeddings),
         scored AS (
            SELECT query_id, cand_id, {cosine_sql('q_emb', 'c_emb')} AS cosine
            FROM c CROSS JOIN q
            WHERE query_id <> cand_id
         )
    SELECT query_id, cand_id, cosine, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def _ann_topk_bruteforce(spark, t):
    # exact cosine top-k baseline: broadcast queries, map-side scoring
    return brute_force_topk(t["embeddings"], _q_pred(), k=5)


@query("ann_topk_lsh", _topk_oracle("JOIN q USING (bucket)"))
def _ann_topk_lsh(spark, t):
    # LSH-bucketed ANN: same ranking math, bucket-pruned candidates
    return lsh_topk(t["embeddings"], _q_pred(), _PLANES, k=5)


@query(
    "ann_topk_ivf",
    f"""
    WITH cents AS (
        SELECT vec_id AS cell, embedding AS cent_emb FROM embeddings
        WHERE vec_id % 50 = 0
    ),
    assigned AS (
        SELECT vec_id, embedding, cell FROM (
            SELECT e.vec_id, e.embedding, cents.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {cosine_sql('e.embedding', 'cent_emb')} DESC, cell
                   ) AS __rk
            FROM embeddings e CROSS JOIN cents
        ) WHERE __rk = 1
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, cell FROM assigned
          WHERE vec_id < 8),
    c AS (SELECT vec_id AS cand_id, embedding AS c_emb, cell FROM assigned),
    scored AS (
        SELECT query_id, cand_id, {cosine_sql('q_emb', 'c_emb')} AS cosine
        FROM c JOIN q USING (cell)
        WHERE query_id <> cand_id
    )
    SELECT query_id, cand_id, cosine, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def _ann_topk_ivf(spark, t):
    # IVF ANN: deterministic coarse centroids, nprobe=1 cell probe —
    # search cost scales with cell size, not corpus size
    return ivf_topk(t["embeddings"], _q_pred(), k=5, centroid_mod=50)


@query(
    "embedding_neardup_pairs",
    f"""
    WITH b AS (SELECT vec_id, embedding,
                      {lsh_bucket_sql('embedding', _PLANES)} AS bucket
               FROM embeddings)
    SELECT a.vec_id AS vec_a, bb.vec_id AS vec_b,
           {cosine_sql('a.embedding', 'bb.embedding')} AS cosine
    FROM b a JOIN b bb USING (bucket)
    WHERE a.vec_id < bb.vec_id
      AND {cosine_sql('a.embedding', 'bb.embedding')} >= 0.35
    """,
)
def _embedding_neardup_pairs(spark, t):
    # embedding-cosine near-dup: bucket-restricted pair generation
    return embedding_near_dups(t["embeddings"], _PLANES, threshold=0.35)


from ..operators.similarity import (  # noqa: E402
    ann_topk_int8,
    ann_topk_int8_sql,
    quantize_int8,
    quantize_int8_sql,
)


@query("embedding_quantize_int8", quantize_int8_sql())
def _embedding_quantize_int8(spark, t):
    # symmetric per-vector int8 codes: 4× smaller embeddings, integer
    # dot products downstream — the storage/compute lever for 100 TB ANN
    return quantize_int8(t["embeddings"])


@query("ann_topk_int8", ann_topk_int8_sql(k=5, dim=64))
def _ann_topk_int8(spark, t):
    # the compressed SERVING path over those codes: exact BIGINT dot
    # products (max_abs scale factors cancel in cosine), 4× less IO
    # than the float32 scan — same broadcast-queries shape as
    # ann_topk_bruteforce
    return ann_topk_int8(t["embeddings"], _q_pred(), k=5)


@query("kmeans_clusters", kmeans_oracle_sql(k=8, iters=2, dim=64))
def _kmeans_clusters(spark, t):
    # distributed Lloyd's, 2 iterations, K=8 — bit-reproducible via
    # fixed-point centroid accumulation (operators/clustering.py); the
    # DuckDB oracle unrolls the SAME iterations, proving an ITERATIVE
    # algorithm end-to-end, not just one step
    return kmeans(t["embeddings"], k=8, iters=2, dim=64)


@query(
    "ann_topk_filtered",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
               WHERE vec_id < 8),
         c AS (SELECT e.vec_id AS cand_id, e.embedding AS c_emb
               FROM embeddings e
               JOIN documents d ON d.doc_id = e.vec_id
               WHERE d.lang = 'en'),
         scored AS (
            SELECT query_id, cand_id, {cosine_sql('q_emb', 'c_emb')} AS cosine
            FROM c CROSS JOIN q
            WHERE query_id <> cand_id
         )
    SELECT query_id, cand_id, cosine, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, cand_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def _ann_topk_filtered(spark, t):
    # FILTERED vector search: top-k under a metadata predicate (the
    # retrieval shape RAG / curation pipelines actually run — "nearest
    # English docs", "same-license only"). The predicate prunes the
    # candidate side BEFORE scoring via an equi-join to the metadata
    # table: with a selective filter the scoring cost drops
    # proportionally, and the top-k can never come back short the way
    # post-filtering an unfiltered top-k does. Queries stay unfiltered
    # (search from any doc into the filtered corpus).
    cand = t["embeddings"].join(
        t["documents"]
        .filter(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id")),
        "vec_id",
    )
    return brute_force_topk(
        t["embeddings"], _q_pred(), k=5, candidates=cand
    )
