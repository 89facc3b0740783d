"""Deduplication operators for training-data pipelines.

Four tiers, all expressed as DataFrame plans (no Python UDFs — every
hash/shingle/band expression is native Spark SQL, codegen'd):

- exact:     md5-fingerprint groupBy — one shuffle on the fingerprint.
- MinHash:   shingle → K minhashes → B bands → bucket equi-join.
             The classic distributed LSH: candidate generation is a
             shuffle on (band, bucket) instead of an O(n²) cross join.
- SimHash:   60-bit signature via per-token hash bit-voting; candidate
             pairs via 15-bit band equi-join + hamming verify.
- Jaccard:   exact n-gram Jaccard verification for candidate pairs.

Hashing is ENGINE-PORTABLE so the whole pipeline is oracle-checkable
against DuckDB: the base hash is the top 60 bits of md5 parsed as an
integer (Spark ``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB
``('0x'||substr(md5(x),1,15))::BIGINT``), and the K minhash
permutations are an LCG family ``(a_k·x + b_k) mod P`` with P = 2³¹−1
— pure modular arithmetic that evaluates bit-identically in any
engine, and cheaper than K seeded digests (one md5 per shingle, K
integer ops). Coefficients are deterministic (md5-derived literals).

Scale notes: bucket sizes are capped (``max_bucket``) so a degenerate
bucket (boilerplate-heavy corpora) can't quadratically explode one
reducer — the standard LSH skew control. All joins shuffle on
uniformly-distributed fixed-width hash keys.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint

# ---- engine-portable hashing ----------------------------------------------

#: prime modulus for the LCG minhash permutation family (2^31 - 1).
#: (a·x + b) mod P with a, b, x < P keeps every product < 2^62 — no
#: 64-bit overflow in either engine (Spark wraps, DuckDB raises; we hit
#: neither).
P_MOD = 2_147_483_647

# 60-bit integer from the first 15 hex chars of md5 — the portable base
# hash. Spark side (conv parses hex → decimal string → bigint):
H60 = "CAST(conv(substr(md5({x}),1,15),16,10) AS BIGINT)"
# DuckDB twin (used by the oracle SQL in plans/queries_dedup.py):
H60_SQL = "('0x' || substr(md5({x}),1,15))::BIGINT"


def lcg_coeffs(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a_k, b_k) pairs for the minhash permutation
    family — md5-derived so they are stable across sessions, Python
    versions, and engines (they are embedded as literals in both the
    Spark expression and the DuckDB oracle SQL)."""

    def h15(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    a = [h15(f"minhash-a-{k}") % (P_MOD - 1) + 1 for k in range(num_hashes)]
    b = [h15(f"minhash-b-{k}") % P_MOD for k in range(num_hashes)]
    return a, b

# 3-word shingles of the lowercased token stream, deduplicated. The
# token array is bound ONCE via the single-element-array lambda (as a
# bare subexpression it would be collapse-inlined into the per-shingle
# lambda and the text re-split size(tokens) times per row).
SHINGLES_EXPR = (
    "transform(array({t}), tok -> array_distinct(transform("
    "  sequence(1, greatest(size(tok) - 2, 1)),"
    "  i -> concat_ws(' ', slice(tok, i, 3)))))[0]"
)
TOKENS = r"split(lower(trim(text)), '\\s+')"


def with_shingles(docs: DataFrame, out: str = "shingles") -> DataFrame:
    return docs.withColumn(out, F.expr(SHINGLES_EXPR.format(t=TOKENS)))


def shingle_pair_counts(
    docs: DataFrame, max_df: int = 64
) -> tuple[DataFrame, DataFrame]:
    """Exact shared-shingle pair counts WITHOUT a doc×doc join: explode
    to shingle grain, drop ubiquitous shingles (df > ``max_df`` — the
    measured skew cap: one boilerplate shingle shared by n docs alone
    fans out n² pairs; such text is exact-dedup material anyway), then
    a shingle-grain self-equi-join aggregated to pair grain.

    Returns ``(pairs, sizes)``: ``pairs(doc_a < doc_b, n_inter)`` and
    ``sizes(doc_id, n_sh)`` — counted AFTER the df cap so containment/
    Jaccard ratios are consistent with the candidate set. Shared by
    docs_shingle_containment and dedup_threshold_sweep.

    The capped shingle table feeds THREE consumers (sizes + both
    self-join sides) and AQE does not reuse the exchange across them
    (measured: 9 corpus explodes per query unpersisted), so it is
    persisted — the docs_novelty_hapax precedent: cache the
    shingle-grain intermediate, not the corpus."""
    sh = with_shingles(docs).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
    )
    shf = sh.join(rare.select("shingle"), "shingle").persist()
    sizes = shf.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = shf.alias("a"), shf.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return pairs, sizes


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


def _sig_expr(num_hashes: int) -> str:
    # Hash every shingle to an int ONCE (one md5), then derive the K
    # minhashes with the LCG permutation family — no per-(shingle, k)
    # digest. The single-element-array lambda binding
    # (transform(array(x), hs -> ...)[0]) forces one evaluation of the
    # shingle-hash array per row; as a plain column it would be
    # projection-collapsed into all K lambdas and recomputed.
    a, b = lcg_coeffs(num_hashes)
    arr_a = "array(" + ",".join(f"{v}L" for v in a) + ")"
    arr_b = "array(" + ",".join(f"{v}L" for v in b) + ")"
    hs = f"transform(shingles, s -> {H60.format(x='s')} % {P_MOD})"
    return (
        f"transform(array({hs}), hs -> transform(sequence(0, {num_hashes - 1}),"
        f" k -> array_min(transform(hs, x -> ({arr_a}[k] * x + {arr_b}[k]) % {P_MOD}))))[0]"
    )


def minhash_signatures(docs: DataFrame, num_hashes: int = 16) -> DataFrame:
    """K minhashes per doc as one native expression — one md5 per
    shingle, then K LCG permutations, min-reduced. No shuffle."""
    return with_shingles(docs).withColumn("minhash", F.expr(_sig_expr(num_hashes)))


def _band_buckets_from_shingled(
    sh: DataFrame, num_hashes: int, bands: int
) -> DataFrame:
    """(doc_id, band, bucket) from a (doc_id, shingles) table — the
    LSH index grain. Bucket key = portable 60-bit hash of the band's
    signature slice: fixed 8-byte shuffle keys (vs variable-length
    strings) at scale."""
    rows = num_hashes // bands
    sigs = sh.select("doc_id", F.expr(_sig_expr(num_hashes)).alias("minhash"))
    band_slice = f"concat_ws(',', slice(minhash, b * {rows} + 1, {rows}))"
    band_expr = (
        f"transform(sequence(0, {bands - 1}),"
        f" b -> {H60.format(x=band_slice)})"
    )
    return sigs.select(
        "doc_id", F.posexplode(F.expr(band_expr)).alias("band", "bucket")
    )


def minhash_band_buckets(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """The persistable LSH index table for ``docs``: (doc_id, band,
    bucket). In a steady-state pipeline this is written ONCE per
    ingested batch (a few rows × 16 bytes per doc) and reused by every
    later incremental dedup — new crawls never re-shingle the corpus."""
    return _band_buckets_from_shingled(
        with_shingles(docs).select("doc_id", "shingles"), num_hashes, bands
    )


def _cap_buckets(bk: DataFrame, max_bucket: int) -> DataFrame:
    """Drop (band, bucket) groups larger than ``max_bucket`` — the
    standard LSH skew control, applied per side."""
    return bk.join(
        bk.groupBy("band", "bucket")
        .count()
        .filter(F.col("count") <= max_bucket)
        .select("band", "bucket"),
        ["band", "bucket"],
    )


def minhash_candidates_incremental(
    new_buckets: DataFrame,
    seen_buckets: DataFrame,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-dup CANDIDATES of a new batch against an already-indexed
    corpus: returns distinct (new_doc_id, seen_doc_id) sharing any
    capped (band, bucket). The incremental twin of
    ``minhash_candidates`` — the corpus side joins by its PRECOMPUTED
    index table (minhash_band_buckets), so a daily crawl shuffles only
    its own buckets; the 100 TB corpus is never re-shingled or
    re-scanned beyond its index. Skew caps apply per side (a
    boilerplate bucket in either the batch or the corpus is dropped
    before the join)."""
    n = _cap_buckets(new_buckets, max_bucket).select(
        F.col("doc_id").alias("new_doc_id"), "band", "bucket"
    )
    s = _cap_buckets(seen_buckets, max_bucket).select(
        F.col("doc_id").alias("seen_doc_id"), "band", "bucket"
    )
    return (
        n.join(s, ["band", "bucket"])
        .select("new_doc_id", "seen_doc_id")
        .distinct()
    )


def minhash_candidates(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 64,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become a
    candidate pair. Returns (doc_a, doc_b) with doc_a < doc_b.

    Materialization strategy (the thing that makes this survive 100 TB):
    the corpus-side expressions (shingle → K hashes) run EXACTLY ONCE —
    the signature table (doc_id + K longs, ~1e-4 of corpus bytes) is
    persisted before banding. Without the persist, Catalyst's projection
    collapse inlines the shingle pipeline into every band lambda and
    every reuse of the exploded plan (count + both self-join sides),
    multiplying the corpus scan work ~bands × 3 × num_hashes.
    """
    if bands > num_hashes or num_hashes % bands != 0:
        # trailing minhashes would be silently ignored (quietly changing
        # LSH recall), and bands > num_hashes gives rows=0 → every doc
        # collides in every band
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    sh = shingled if shingled is not None else with_shingles(docs).select("doc_id", "shingles").persist()
    exploded = _band_buckets_from_shingled(sh, num_hashes, bands).persist()
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


def lsh_bucket_profile(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """Per-band LSH skew diagnostics: bucket/row counts and how much
    the ``max_bucket`` cap drops. One row per band:
    (band, n_buckets, n_rows, max_bucket_size, n_dropped_buckets,
    n_dropped_rows, dropped_pairs_avoided).

    ``dropped_pairs_avoided`` = Σ s·(s−1)/2 over dropped buckets — the
    candidate pairs the cap PREVENTED. On a boilerplate-heavy corpus
    this is the quadratic blowup that would otherwise land on single
    reducers; profiling it turns the "skew-capped" design claim into a
    measured number (see tests/test_readers_skew.py and PERF_NOTES.md).
    Cost: the same exploded (band,bucket) table minhash_candidates
    builds, aggregated twice at bucket then band grain — no self-join.
    """
    rows = num_hashes // bands
    sigs = with_shingles(docs).select(
        "doc_id", F.expr(_sig_expr(num_hashes)).alias("minhash")
    )
    band_slice = f"concat_ws(',', slice(minhash, b * {rows} + 1, {rows}))"
    band_expr = (
        f"transform(sequence(0, {bands - 1}),"
        f" b -> {H60.format(x=band_slice)})"
    )
    bucket_sizes = (
        sigs.select(
            "doc_id", F.posexplode(F.expr(band_expr)).alias("band", "bucket")
        )
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    dropped = F.col("sz") > max_bucket
    return (
        bucket_sizes.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("sz").alias("n_rows"),
            F.max("sz").alias("max_bucket_size"),
            F.sum(dropped.cast("long")).alias("n_dropped_buckets"),
            F.sum(F.when(dropped, F.col("sz")).otherwise(0)).alias(
                "n_dropped_rows"
            ),
            F.sum(
                F.when(dropped, F.col("sz") * (F.col("sz") - 1) / 2)
                .otherwise(0.0)
                .cast("long")
            ).alias("dropped_pairs_avoided"),
        )
        .orderBy("band")
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """Exact 3-gram Jaccard on candidate pairs. int/int division —
    deterministic on any engine. The shingle table joins in twice
    (doc_a, doc_b side); pass a persisted ``shingled`` to shingle the
    corpus once across candidate generation and verification."""
    sh = (
        shingled
        if shingled is not None
        else with_shingles(docs).select("doc_id", "shingles").persist()
    )
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
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify.
    One persisted shingle table feeds both stages."""
    sh = with_shingles(docs).select("doc_id", "shingles").persist()
    cand = minhash_candidates(docs, num_hashes, bands, shingled=sh)
    return jaccard_verify(docs, cand, threshold, shingled=sh)


# ---- SimHash ---------------------------------------------------------------

#: signature width — 60 bits (the portable md5-derived hash yields 60
#: bits), split into 4 bands of 15 bits for candidate generation
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15
_BAND_MASK = (1 << _BAND_BITS) - 1  # 32767

_SIMHASH_EXPR = (
    # per-token portable 60-bit hashes
    f"aggregate(transform(array_distinct({TOKENS}), t -> {H60.format(x='t')}),"
    # accumulator: 60 bit-vote counters
    f" transform(sequence(0, {SIMHASH_BITS - 1}), j -> 0L),"
    f" (acc, h) -> transform(sequence(0, {SIMHASH_BITS - 1}),"
    "   j -> acc[j] + CASE WHEN (shiftright(h, j) & 1) = 1 THEN 1 ELSE -1 END),"
    # finish: fold positive votes into bits (bitwise OR — no overflow).
    # NB Spark SQL array indexing is 0-based.
    f" acc -> aggregate(sequence(0, {SIMHASH_BITS - 1}), 0L,"
    "   (s, j) -> CASE WHEN acc[j] > 0 THEN s | shiftleft(1L, j) ELSE s END))"
)


def simhash(docs: DataFrame, out: str = "simhash") -> DataFrame:
    """60-bit SimHash per document, entirely in native expressions."""
    return docs.withColumn(out, F.expr(_SIMHASH_EXPR))


def simhash_near_dups(
    docs: DataFrame, max_hamming: int = 8, max_bucket: int = 64
) -> DataFrame:
    """Candidate pairs sharing any 15-bit band of the signature, then
    hamming-distance verify — detects near-dups that survive small
    edits. Pigeonhole: hamming ≤ 3 guarantees a shared band; larger
    distances are best-effort (documented recall/cost trade).

    ``max_bucket`` is the same skew control as MinHash banding: a
    boilerplate-heavy corpus puts thousands of docs in one band bucket
    and the self-join goes quadratic on a single reducer — capped
    buckets bound every bucket's pair count at max_bucket²/2."""
    # persist the signature table (doc_id + one long): the 60-counter
    # bit-vote aggregate runs once per doc, not once per band per side
    sh = simhash(docs).select("doc_id", "simhash").persist()
    bands = F.expr(
        f"transform(sequence(0, {SIMHASH_BANDS - 1}),"
        f" b -> (shiftright(simhash, b * {_BAND_BITS}) & {_BAND_MASK}))"
    )
    exploded = sh.select(
        "doc_id", "simhash", F.posexplode(bands).alias("band", "bucket")
    ).persist()
    exploded = exploded.join(
        exploded.groupBy("band", "bucket")
        .count()
        .filter(F.col("count") <= max_bucket)
        .select("band", "bucket"),
        ["band", "bucket"],
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
