"""Deduplication operators for training-data pipelines.

Four tiers, all expressed as DataFrame plans (no Python UDFs — every
hash/shingle/band expression is native Spark SQL, codegen'd):

- exact:     md5-fingerprint groupBy — one shuffle on the fingerprint.
- MinHash:   shingle → K minhashes → B bands → bucket equi-join.
             The classic distributed LSH: candidate generation is a
             shuffle on (band, bucket) instead of an O(n²) cross join.
- SimHash:   64-bit signature via per-token hash bit-voting; candidate
             pairs via 16-bit band equi-join + hamming verify.
- Jaccard:   exact n-gram Jaccard verification for candidate pairs.

Scale notes: bucket sizes are capped (``max_bucket``) so a degenerate
bucket (boilerplate-heavy corpora) can't quadratically explode one
reducer — the standard LSH skew control. All joins shuffle on
uniformly-distributed hash keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint

# 3-word shingles of the lowercased token stream, deduplicated.
SHINGLES_EXPR = (
    "array_distinct(transform("
    "  sequence(1, greatest(size({t}) - 2, 1)),"
    "  i -> concat_ws(' ', slice({t}, i, 3))))"
)
TOKENS = r"split(lower(trim(text)), '\\s+')"


def with_shingles(docs: DataFrame, out: str = "shingles") -> DataFrame:
    return docs.withColumn(out, F.expr(SHINGLES_EXPR.format(t=TOKENS)))


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """One row per distinct normalized text: canonical id + copy count."""
    return (
        docs.withColumn("fingerprint", fingerprint())
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_keep_canonical(docs: DataFrame) -> DataFrame:
    """The dedup operator itself: keep the min-doc_id row per
    fingerprint. Deterministic (min over the group), single shuffle."""
    w = Window.partitionBy("fingerprint")
    return (
        docs.withColumn("fingerprint", fingerprint())
        .withColumn("__min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__min_id"))
        .drop("__min_id", "fingerprint")
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 16) -> DataFrame:
    """K minhashes per doc as one native expression — K seeded xxhash64
    passes over the shingle array, min-reduced. No shuffle."""
    sig = (
        f"transform(sequence(0, {num_hashes - 1}),"
        " h -> array_min(transform(shingles,"
        "      s -> xxhash64(concat(s, '|', cast(h as string))))))"
    )
    return with_shingles(docs).withColumn("minhash", F.expr(sig))


def minhash_candidates(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a
    candidate pair. Returns (doc_a, doc_b) with doc_a < doc_b."""
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes)
    band_expr = (
        f"transform(sequence(0, {bands - 1}),"
        f" b -> xxhash64(concat_ws(',', slice(minhash, b * {rows} + 1, {rows}))))"
    )
    exploded = (
        sigs.select("doc_id", F.posexplode(F.expr(band_expr)).alias("band", "bucket"))
    )
    # skew control: drop degenerate buckets before the self-join
    sized = exploded.join(
        exploded.groupBy("band", "bucket")
        .count()
        .filter(F.col("count") <= max_bucket)
        .select("band", "bucket"),
        ["band", "bucket"],
    )
    a, b = sized.alias("a"), sized.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    docs: DataFrame, pairs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact 3-gram Jaccard on candidate pairs. int/int division —
    deterministic on any engine."""
    sh = with_shingles(docs).select("doc_id", "shingles")
    joined = (
        pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("shingles", "sh_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .withColumnRenamed("shingles", "sh_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_near_dups(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify."""
    return jaccard_verify(
        docs, minhash_candidates(docs, num_hashes, bands), threshold
    )


# ---- SimHash ---------------------------------------------------------------

_SIMHASH_EXPR = (
    # per-token 64-bit hashes
    f"aggregate(transform(array_distinct({TOKENS}), t -> xxhash64(t)),"
    # accumulator: 64 bit-vote counters
    " transform(sequence(0, 63), j -> 0L),"
    " (acc, h) -> transform(sequence(0, 63),"
    "   j -> acc[j] + CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END),"
    # finish: fold positive votes into bits (bitwise OR — no overflow).
    # NB Spark SQL array indexing is 0-based.
    " acc -> aggregate(sequence(0, 63), 0L,"
    "   (s, j) -> CASE WHEN acc[j] > 0 THEN s | shiftleft(1L, j) ELSE s END))"
)


def simhash(docs: DataFrame, out: str = "simhash") -> DataFrame:
    """64-bit SimHash per document, entirely in native expressions."""
    return docs.withColumn(out, F.expr(_SIMHASH_EXPR))


def simhash_near_dups(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Candidate pairs sharing any 16-bit band of the signature, then
    hamming-distance verify — detects near-dups that survive small
    edits. Pigeonhole: hamming ≤ 3 guarantees a shared band; larger
    distances are best-effort (documented recall/cost trade)."""
    sh = simhash(docs).select("doc_id", "simhash")
    bands = F.expr(
        "transform(sequence(0, 3), b -> (shiftright(simhash, b * 16) & 65535))"
    )
    exploded = sh.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band", "bucket")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
