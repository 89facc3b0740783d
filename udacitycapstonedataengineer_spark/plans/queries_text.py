"""Text-analysis queries over the ``documents`` table (training-data
pipeline surface: language-ID, quality scoring, token counting,
fingerprinting). All per-row native expressions — no shuffle beyond
the scan, fully codegen'd."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions import text as X
from .registry import query


@query(
    "text_token_stats",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_measured,
           {X.n_tokens_sql()} AS n_tokens,
           {X.n_bpe_tokens_sql()} AS n_bpe_tokens,
           {X.punct_count_sql()} AS n_punct
    FROM documents
    """,
)
def _text_token_stats(spark, t):
    return t["documents"].select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        X.n_tokens().alias("n_tokens"),
        X.n_bpe_tokens().alias("n_bpe_tokens"),
        X.punct_count().alias("n_punct"),
    )


@query(
    "text_quality_score",
    f"""
    SELECT doc_id,
           n_tokens,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE CAST(stop_hits AS DOUBLE) / n_tokens END AS stopword_ratio,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(n_punct AS DOUBLE) / length(text) END AS punct_ratio,
           (n_tokens >= 10 AND stop_hits > 0) AS quality_ok
    FROM (
        SELECT doc_id, text,
               {X.n_tokens_sql()} AS n_tokens,
               {X.stop_hits_sql('en')} AS stop_hits,
               {X.punct_count_sql()} AS n_punct
        FROM documents
    )
    """,
)
def _text_quality_score(spark, t):
    # length/punct/stopword heuristics — the standard pre-training
    # quality gates, as one codegen'd projection
    d = t["documents"].select(
        "doc_id",
        "text",
        X.n_tokens().alias("n_tokens"),
        X.stop_hits("en").alias("stop_hits"),
        X.punct_count().alias("n_punct"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(F.col("stop_hits").cast("double") / F.col("n_tokens"))
        .alias("stopword_ratio"),
        F.when(F.length("text") == 0, F.lit(0.0))
        .otherwise(F.col("n_punct").cast("double") / F.length("text"))
        .alias("punct_ratio"),
        ((F.col("n_tokens") >= 10) & (F.col("stop_hits") > 0)).alias("quality_ok"),
    )


@query(
    "text_lang_id",
    f"""
    SELECT doc_id, lang AS lang_labeled, {X.lang_id_sql()} AS lang_predicted
    FROM documents
    """,
)
def _text_lang_id(spark, t):
    # n-gram/stopword language-ID heuristic (argmax of per-language
    # stopword hits, deterministic tie-break)
    return t["documents"].select(
        "doc_id",
        F.col("lang").alias("lang_labeled"),
        X.lang_id().alias("lang_predicted"),
    )


@query(
    "text_fingerprint",
    f"""
    SELECT doc_id,
           {X.fingerprint_sql()} AS fingerprint,
           length({X.NORMALIZE_SQL.format(c='text')}) AS n_chars_normalized
    FROM documents
    """,
)
def _text_fingerprint(spark, t):
    # md5 document fingerprint over normalized text — the exact-dedup key
    return t["documents"].select(
        "doc_id",
        X.fingerprint().alias("fingerprint"),
        F.length(F.expr(X.NORMALIZE_EXPR.format(c="text"))).alias(
            "n_chars_normalized"
        ),
    )


def chunk_windows(df, stride: int = 150, width: int = 200, extra_cols=()):
    """Overlapping context-window chunking: ``width``-char windows at a
    ``stride``-char step. sequence+explode is narrow — each row expands
    locally, no shuffle, and output partitions scale with input splits.

    Empty documents are filtered out BEFORE the explode: for
    length(text)=0 the chunk count is 0 and Spark's ``sequence(1, 0)``
    yields a DESCENDING [1, 0] (two bogus chunk rows), while SQL
    engines' generate_series(1, 0) yields none — the guard pins the
    zero-chunks semantics on both."""
    n_chunks = (F.floor((F.length("text") - 1) / stride) + 1).cast("long")
    cols = [*extra_cols, "doc_id"]
    return (
        df.filter(F.length("text") > 0)
        .select(
            *cols,
            "text",
            F.explode(F.sequence(F.lit(1).cast("long"), n_chunks)).alias("i"),
        )
        .selectExpr(
            *cols,
            "i AS chunk_id",
            f"substr(text, CAST((i - 1) * {stride} + 1 AS INT), {width}) AS chunk",
        )
    )


@query(
    "docs_chunk_windows",
    """
    SELECT doc_id, i AS chunk_id,
           substr(text, (i - 1) * 150 + 1, 200) AS chunk
    FROM (SELECT doc_id, text,
                 unnest(generate_series(
                     1, CAST(floor((length(text) - 1) / 150) AS BIGINT) + 1
                 )) AS i
          FROM documents
          WHERE length(text) > 0)
    """,
)
def _docs_chunk_windows(spark, t):
    # context-window chunking — the shard step before tokenization in a
    # training pipeline (see chunk_windows for the empty-doc guard)
    return chunk_windows(t["documents"])


@query(
    "text_top_terms",
    r"""
    SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
    FROM (SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '\s+')) AS term
          FROM documents)
    WHERE term <> ''
    GROUP BY term
    ORDER BY tf DESC, term
    LIMIT 20
    """,
)
def _text_top_terms(spark, t):
    # corpus vocabulary head: term frequency + document frequency,
    # integer-exact, deterministic tie-break (tf desc, term asc) so the
    # top-20 boundary is stable. One shuffle on term; the final top-k
    # is TakeOrderedAndProject (per-partition heap, no global sort).
    toks = (
        t["documents"]
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("term"))
        .limit(20)
    )


@query(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def _json_extract_props(spark, t):
    # semi-structured extraction: Spark get_json_object ↔ DuckDB json_extract
    return t["events"].select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@query(
    "grouped_median_dev",
    """
    WITH ev AS (
        SELECT event_id, user_id, trunc(value * 100)::BIGINT AS value_cents
        FROM events
    )
    SELECT event_id, user_id, value_cents,
           median(value_cents) OVER (PARTITION BY user_id) AS median_val,
           value_cents - median(value_cents) OVER (PARTITION BY user_id)
               AS dev_val
    FROM ev
    """,
)
def _grouped_median_dev(spark, t):
    # applyInPandas grouped-map surface (operators/grouped.py) on a
    # MID-cardinality key — per-user median event value in exact minor
    # units. user count scales with the data, so group sizes stay
    # bounded at 100 TB (the low-cardinality form is
    # grouped_median_dev_native below). The oracle runs the same math
    # as a window median — proving the pandas path bit-matches SQL.
    from ..operators.grouped import median_dev_grouped

    ev = t["events"].select(
        "event_id",
        "user_id",
        (F.col("value") * 100).cast("long").alias("value_cents"),
    )
    return median_dev_grouped(ev, key="user_id", id_col="event_id",
                              val_col="value_cents")


@query(
    "grouped_median_dev_native",
    """
    SELECT doc_id, source, n_chars,
           median(n_chars) OVER (PARTITION BY source) AS median_val,
           n_chars - median(n_chars) OVER (PARTITION BY source) AS dev_val
    FROM documents
    """,
)
def _grouped_median_dev_native(spark, t):
    # the LOW-cardinality-safe twin: exact median via middle-rank
    # extraction (spill-backed window sort + broadcast join back) —
    # no unbounded pandas group materialization
    from ..operators.grouped import median_dev_native

    return median_dev_native(
        t["documents"], key="source", id_col="doc_id", val_col="n_chars"
    )


@query(
    "pii_redact_contacts",
    f"""
    WITH c AS (
        SELECT c_custkey,
               c_name || ' <' || lower(replace(c_name, '#', '.'))
               || '@example.com> tel 555-' || printf('%03d', c_custkey % 1000)
               || '-' || printf('%04d', c_custkey % 10000)
               || ' ip 10.0.' || CAST(c_custkey % 256 AS VARCHAR)
               || '.' || CAST(c_custkey % 250 AS VARCHAR) AS contact
        FROM customer
    )
    SELECT c_custkey, {X.redact_pii_sql('contact')} AS redacted
    FROM c
    """,
)
def _pii_redact_contacts(spark, t):
    # PII scrub — the pre-training redaction pass. The contact string
    # is CONSTRUCTED from customer rows (the synthetic corpus has no
    # PII), then redacted; running construction + redaction on both
    # engines makes the oracle a true Java-regex ↔ RE2 parity check
    # over thousands of distinct realistic values.
    contact = F.concat(
        F.col("c_name"),
        F.lit(" <"),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com> tel 555-"),
        F.format_string("%03d", F.col("c_custkey") % 1000),
        F.lit("-"),
        F.format_string("%04d", F.col("c_custkey") % 10000),
        F.lit(" ip 10.0."),
        (F.col("c_custkey") % 256).cast("string"),
        F.lit("."),
        (F.col("c_custkey") % 250).cast("string"),
    )
    return (
        t["customer"]
        .select("c_custkey", contact.alias("contact"))
        .select("c_custkey", X.redact_pii("contact").alias("redacted"))
    )


@query(
    "text_tfidf_top_terms",
    r"""
    WITH toks AS (
        SELECT doc_id, term
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\s+')) AS term
              FROM documents)
        WHERE term <> ''
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
    SELECT doc_id, term, tf, df, term_rank FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf DESC, df.df ASC, tf.term)
                   AS term_rank
        FROM tf JOIN df ON tf.term = df.term)
    WHERE term_rank <= 3
    ORDER BY doc_id, term_rank
    """,
)
def _text_tfidf_top_terms(spark, t):
    # tf-idf characteristic terms per document — the feature-selection
    # step of corpus curation. The idf ORDERING is what matters, and
    # (tf DESC, df ASC, term) ranks exactly as tf·log(N/df) would
    # while staying in integers — no engine-libm log in the compared
    # output (ln(x) is not bit-identical across math libraries). Plan:
    # tf is one (doc,term) shuffle, df one term shuffle, the join
    # re-uses df's term partitioning, and the per-doc top-3 is a
    # running row_number — no global sort of the token stream.
    # persisted: tf and df branches both consume the token stream —
    # unpersisted, the scan+explode pipeline runs twice
    toks = (
        t["documents"]
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .persist()
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = toks.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(df, "term")
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= 3)
        .select("doc_id", "term", "tf", "df", "term_rank")
        .orderBy("doc_id", "term_rank")
    )


@query(
    "text_fuzzy_pairs_levenshtein",
    """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40))
               AS edit_dist
    FROM documents a
    JOIN documents b
      ON substr(a.text, 1, 8) = substr(b.text, 1, 8)
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 12
    ORDER BY id_a, id_b
    """,
)
def _text_fuzzy_pairs_levenshtein(spark, t):
    # edit-distance near-dup verify: exact Levenshtein on 40-char
    # prefixes, RESTRICTED to an 8-char-prefix equi-join bucket so the
    # pair space is bucket-local (the same blocking discipline as the
    # LSH pipelines — never all-pairs). Levenshtein is an exact integer
    # metric with one standard definition, so Spark and DuckDB agree
    # bit-for-bit. At scale the prefix bucket join is one hash shuffle;
    # O(40²) DP per candidate pair only.
    d = t["documents"].select("doc_id", F.substring("text", 1, 40).alias("p40"),
                              F.substring("text", 1, 8).alias("p8"))
    a = d.select(F.col("doc_id").alias("id_a"), F.col("p40").alias("pa"),
                 F.col("p8").alias("ba"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("p40").alias("pb"),
                 F.col("p8").alias("bb"))
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("edit_dist", F.levenshtein("pa", "pb"))
        .filter(F.col("edit_dist") <= 12)
        .select("id_a", "id_b", "edit_dist")
        .orderBy("id_a", "id_b")
    )


@query(
    "text_pseudonymize_sha2",
    """
    SELECT sha256('pepper-2026|' || CAST(user_id AS VARCHAR)) AS uid_pseudo,
           count(*) AS n_events
    FROM events
    GROUP BY uid_pseudo
    ORDER BY uid_pseudo
    """,
)
def _text_pseudonymize_sha2(spark, t):
    # keyed pseudonymization — the reversible-only-with-the-pepper
    # counterpart to pii_redact_contacts: replace the identifier with
    # sha256(pepper || id) so per-user analytics still join/group while
    # raw ids never leave the cluster. Pure native hash, zero shuffle
    # beyond the count aggregate; both engines emit identical lowercase
    # hex.
    pseudo = F.sha2(
        F.concat(F.lit("pepper-2026|"), F.col("user_id").cast("string")), 256
    )
    return (
        t["events"]
        .groupBy(pseudo.alias("uid_pseudo"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("uid_pseudo")
    )


@query(
    "docs_novelty_hapax",
    r"""
    WITH dt AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '\s+'),
                           s -> s <> '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1]))
                   AS bigram
        FROM dt
    ),
    freq AS (SELECT bigram, count(*) AS n FROM bg GROUP BY 1)
    SELECT bg.doc_id,
           count(*) AS n_bigrams,
           CAST(SUM(CASE WHEN freq.n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST(SUM(CASE WHEN freq.n = 1 THEN 1 ELSE 0 END) * 10000
                    // count(*) AS BIGINT) AS novelty_bp
    FROM bg JOIN freq ON bg.bigram = freq.bigram
    GROUP BY 1
    ORDER BY 1
    """,
)
def _docs_novelty_hapax(spark, t):
    # corpus-novelty quality signal: the fraction of a document's word
    # bigrams that are HAPAX in the corpus (occur exactly once
    # anywhere). High hapax share = unusual text (fresh content, or
    # garbage); low = boilerplate assembled from common phrasing. The
    # LM-free stand-in for a perplexity filter, and integer-exact end
    # to end (basis points via integer division) so it hash-matches
    # any engine — no libm in the compared output. Plan: narrow
    # explode to (doc, bigram) grain; ONE bigram-grain shuffle for the
    # corpus frequency; the join back reuses the bigram partitioning;
    # final per-doc agg is a doc-grain shuffle. Never doc×doc, no
    # skew: bigram keys are near-uniform.
    # bind the token array ONCE via the single-element-array lambda
    # (the SHINGLES_EXPR discipline — a bare subexpression would be
    # projection-collapsed into the per-bigram lambda); CASE guards
    # 0/1-token docs (Spark's sequence(0, -1) would count DOWN)
    bigrams = (
        "transform(array(filter(split(lower(text), '\\\\s+'), s -> s != '')),"
        " tok -> CASE WHEN size(tok) < 2 THEN array()"
        " ELSE transform(sequence(0, size(tok) - 2),"
        "                i -> concat(tok[i], ' ', tok[i + 1])) END)[0]"
    )
    # persisted: bg feeds both the corpus frequency AND the join-back
    # side — unpersisted, the scan+explode pipeline runs twice
    bg = t["documents"].select(
        "doc_id", F.explode(F.expr(bigrams)).alias("bigram")
    ).persist()
    freq = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    return (
        bg.join(freq, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum((F.col("n") == 1).cast("long")).alias("n_hapax"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_hapax",
            F.expr("n_hapax * 10000 DIV n_bigrams").alias("novelty_bp"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_keyword_search_topk",
    r"""
    WITH toks AS (
        SELECT doc_id, term
        FROM (SELECT doc_id,
                     unnest(regexp_split_to_array(lower(text), '\s+')) AS term
              FROM documents)
        WHERE term IN ('scan', 'join', 'hash')
    ),
    hits AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
    )
    SELECT doc_id, total_tf, rank FROM (
        SELECT doc_id, total_tf,
               row_number() OVER (ORDER BY total_tf DESC, doc_id) AS rank
        FROM (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS total_tf
              FROM hits GROUP BY doc_id
              HAVING count(DISTINCT term) = 3)
    )
    WHERE rank <= 10
    ORDER BY rank
    """,
)
def _text_keyword_search_topk(spark, t):
    # conjunctive (AND) keyword retrieval with tf ranking — the
    # boolean-retrieval primitive over the same token stream as the
    # inverted index. Ranking stays in integers (total term frequency,
    # doc_id tie-break) per the no-libm discipline; BM25's idf/log
    # factor is deliberately out of the compared output. Plan: a
    # conjunctive substring pre-filter (a strict SUPERSET of the
    # token-equality match, so results are unchanged) runs in the
    # scan stage so the explode fans out over candidate docs only —
    # at 100 TB the corpus-wide tokenize is the cost, not the
    # aggregate; then the IN-list filter drops non-query tokens, one
    # (doc,term) shuffle, the AND check is count-distinct==|terms|
    # per doc, and the global top-10 is TakeOrderedAndProject
    # (per-partition heaps), never a full sort. Standing-index
    # retrieval (no corpus scan at all) is operators/retrieval.py;
    # this registered twin stays scan-shaped so DuckDB can oracle it.
    terms = ["scan", "join", "hash"]
    lt = F.lower(F.col("text"))
    candidates = t["documents"].filter(
        reduce(lambda a, b: a & b, [lt.contains(term) for term in terms])
    )
    toks = candidates.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
    ).filter(F.col("term").isin(terms))
    hits = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    qualified = (
        hits.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("total_tf"),
            F.count_distinct("term").alias("n_terms"),
        )
        .filter(F.col("n_terms") == len(terms))
    )
    top = (
        qualified.select("doc_id", "total_tf")
        .orderBy(F.desc("total_tf"), F.asc("doc_id"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("total_tf"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", "total_tf", "rank")
        .orderBy("rank")
    )


@query(
    "docs_length_percentiles_by_source",
    r"""
    WITH n AS (
        SELECT source,
               len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                               s -> s <> '')) AS n_tokens
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           quantile_cont(n_tokens, 0.5) AS p50_tokens,
           quantile_cont(n_tokens, 0.9) AS p90_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM n
    GROUP BY 1
    ORDER BY 1
    """,
)
def _docs_length_percentiles_by_source(spark, t):
    # per-source document-length distribution — the corpus-governance
    # view behind mixture weighting and length-filter threshold
    # choices (token BUDGET by source comes from total_tokens).
    # Integer token counts; medians/p90 interpolate identically
    # (quantile_cont ≡ percentile precedent). One aggregate at source
    # grain, no joins, no explode — size() on the split array never
    # materializes per-token rows.
    n_tokens = F.size(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda s: s != "")
    )
    return (
        t["documents"]
        .select("source", n_tokens.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.expr("percentile(n_tokens, 0.5)").alias("p50_tokens"),
            F.expr("percentile(n_tokens, 0.9)").alias("p90_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("source")
    )
