"""Deduplication queries over ``documents``.

Exact dedup and the n-gram Jaccard verify are oracle-checked (pure
SQL semantics). MinHash/SimHash rely on xxhash64, which DuckDB lacks,
so those register rows-only — the Jaccard oracle still cross-checks
their verification math.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import fingerprint_sql
from ..operators.dedup import (
    SHINGLES_EXPR,
    TOKENS,
    exact_dedup_groups,
    exact_dedup_keep_canonical,
    minhash_near_dups,
    simhash_near_dups,
    with_shingles,
)
from .registry import query

# DuckDB twin of the 3-word-shingle expression (1-based inclusive slices)
_SHINGLES_SQL = (
    "list_distinct(list_transform("
    " generate_series(1, greatest(len(toks) - 2, 1)),"
    " i -> array_to_string(toks[i:i+2], ' ')))"
)
_TOKS_SQL = r"string_split_regex(lower(trim(text)), '\s+')"


@query(
    "dedup_exact_groups",
    f"""
    SELECT {fingerprint_sql()} AS fingerprint,
           min(doc_id) AS canonical_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def _dedup_exact_groups(spark, t):
    # exact dedup: hash-groupBy on the normalized-text fingerprint
    return exact_dedup_groups(t["documents"])


@query(
    "dedup_exact_keep_canonical",
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               min(doc_id) OVER (PARTITION BY {fingerprint_sql()}) AS __min_id
        FROM documents
    ) WHERE doc_id = __min_id
    """,
)
def _dedup_exact_keep_canonical(spark, t):
    return exact_dedup_keep_canonical(t["documents"]).select(
        "doc_id", "lang", "source", "n_chars"
    )


@query(
    "ngram_jaccard_pairs",
    f"""
    WITH sh AS (
        SELECT doc_id, {_SHINGLES_SQL} AS shingles
        FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents WHERE doc_id < 250)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles))
          >= 0.1 * len(list_distinct(list_concat(a.shingles, b.shingles)))
    """,
)
def _ngram_jaccard_pairs(spark, t):
    # exact n-gram Jaccard on a bounded subset (the all-pairs oracle is
    # O(n²); the scalable path is minhash_near_dups below, which uses
    # this same verification math after LSH candidate pruning)
    sh = with_shingles(t["documents"].filter(F.col("doc_id") < 250)).select(
        "doc_id", "shingles"
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union).alias("jaccard"),
            inter.alias("__i"),
            union.alias("__u"),
        )
        .filter(F.col("__i") >= 0.1 * F.col("__u"))
        .drop("__i", "__u")
    )


@query(
    "dedup_incremental_anti",
    f"""
    WITH fp AS (
        SELECT doc_id, source, {fingerprint_sql()} AS fingerprint
        FROM documents
    )
    SELECT n.doc_id, n.source, n.fingerprint
    FROM fp n
    WHERE n.doc_id % 2 = 1
      AND NOT EXISTS (
          SELECT 1 FROM fp s
          WHERE s.doc_id % 2 = 0 AND s.fingerprint = n.fingerprint
      )
    """,
)
def _dedup_incremental_anti(spark, t):
    # incremental dedup: admit a NEW batch only where its fingerprint
    # is absent from the SEEN corpus — the steady-state shape of a
    # training-data pipeline (each crawl dedups against everything
    # already ingested). left_anti join; at 100 TB the seen side is a
    # fingerprint-only projection (16 bytes/doc), bucketable by
    # fingerprint so re-runs co-locate without a fresh shuffle.
    from ..functions.text import fingerprint

    fp = t["documents"].select(
        "doc_id", "source", fingerprint().alias("fingerprint")
    )
    new = fp.filter(F.col("doc_id") % 2 == 1)
    seen = fp.filter(F.col("doc_id") % 2 == 0).select("fingerprint")
    return new.join(seen, "fingerprint", "left_anti").select(
        "doc_id", "source", "fingerprint"
    )


@query("dedup_minhash_lsh")
def _dedup_minhash_lsh(spark, t):
    # MinHash+LSH near-dup pairs (rows-only: xxhash64 has no DuckDB
    # twin; the Jaccard verify stage is oracled via ngram_jaccard_pairs)
    return minhash_near_dups(t["documents"], num_hashes=16, bands=4, threshold=0.3)


@query("dedup_simhash")
def _dedup_simhash(spark, t):
    # SimHash near-dup pairs (rows-only, same xxhash64 caveat)
    return simhash_near_dups(t["documents"], max_hamming=16)
