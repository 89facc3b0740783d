"""Standing-index retrieval (operators/retrieval.py): index-vs-scan
equality, and the term filter actually prunes the persisted postings
scan (VERDICT r4 #2 — the index must be USED, not just built)."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.operators.retrieval import (
    build_bm25_index,
    bm25_search_topk,
    build_term_postings,
    keyword_search_topk,
)
from udacitycapstonedataengineer_spark.plans.queries import QUERIES
from udacitycapstonedataengineer_spark.sources.readers import load_table

TERMS = ["scan", "join", "hash"]


def test_index_routed_search_equals_scan_query(spark, sf_dir, tmp_path):
    """The persisted-postings path returns byte-identical results to
    the registered scan-shaped query (same tokens, same AND, same
    tf/doc_id ranking)."""
    docs = load_table(spark, sf_dir, "documents")
    idx_path = str(tmp_path / "postings")
    build_term_postings(docs).write.mode("overwrite").parquet(idx_path)
    postings = spark.read.parquet(idx_path)

    via_index = keyword_search_topk(postings, TERMS, k=10).collect()
    via_scan = QUERIES["text_keyword_search_topk"](spark, sf_dir).collect()
    assert [r.asDict() for r in via_index] == [r.asDict() for r in via_scan]
    assert via_index, "search unexpectedly empty at this sf"


def test_term_filter_is_pushed_to_postings_scan(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    idx_path = str(tmp_path / "postings2")
    build_term_postings(docs).write.mode("overwrite").parquet(idx_path)
    plan = keyword_search_topk(
        spark.read.parquet(idx_path), TERMS
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term" in plan, plan[:2000]


def test_scan_query_prefilters_before_explode(spark, sf_dir):
    """The registered query's conjunctive contains() pre-filter must
    sit below the explode so the tokenize fans out over candidate
    docs only."""
    plan = (
        QUERIES["text_keyword_search_topk"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the conjunctive Contains predicates ride the file scan's
    # DataFilters — below the explode, evaluated during the scan stage
    assert plan.count("Contains(lower(text") >= len(TERMS), plan[:2000]


BM25_TERMS = ["join", "vector", "stream"]  # the registered query's terms


def test_bm25_index_equals_scan_query(spark, sf_dir, tmp_path):
    """BM25 served from the persisted standing index is bit-identical
    (collected rows, float scores included) to the registered
    scan-shaped oracle twin ``text_bm25_linear_topk`` — VERDICT r7 #4:
    same ranking function, O(postings-of-terms) instead of O(corpus)
    per query."""
    docs = load_table(spark, sf_dir, "documents")
    postings, stats = build_bm25_index(docs)
    idx = str(tmp_path / "bm25_postings")
    st = str(tmp_path / "bm25_stats")
    postings.write.mode("overwrite").parquet(idx)
    stats.write.mode("overwrite").parquet(st)

    via_index = bm25_search_topk(
        spark.read.parquet(idx), spark.read.parquet(st), BM25_TERMS, k=15
    ).collect()
    via_scan = QUERIES["text_bm25_linear_topk"](spark, sf_dir).collect()
    assert [r.asDict() for r in via_index] == [r.asDict() for r in via_scan]
    assert via_index, "bm25 search unexpectedly empty at this sf"


def test_bm25_incremental_index_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Index MAINTENANCE at 100 TB is append-only: a new doc batch
    contributes its own postings rows ((term, doc) grain with the doc
    length denormalized on — disjoint doc sets never rewrite existing
    rows) and the corpus stats merge additively. Serving from
    appended-postings + merged-stats must be bit-identical to a full
    rebuild over the union corpus."""
    from udacitycapstonedataengineer_spark.operators.retrieval import (
        merge_bm25_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter("doc_id % 5 != 0")
    new = docs.filter("doc_id % 5 = 0")

    idx = str(tmp_path / "bm25_inc")
    st = str(tmp_path / "bm25_inc_stats")
    p_old, s_old = build_bm25_index(old)
    p_old.write.mode("overwrite").parquet(idx)
    s_old.write.mode("overwrite").parquet(st)
    # the incremental step: ONLY the new batch is tokenized
    p_new, s_new = build_bm25_index(new)
    p_new.write.mode("append").parquet(idx)
    merged_stats = merge_bm25_stats(spark.read.parquet(st), s_new)

    via_incremental = bm25_search_topk(
        spark.read.parquet(idx), merged_stats, BM25_TERMS, k=15
    ).collect()

    p_full, s_full = build_bm25_index(docs)
    via_rebuild = bm25_search_topk(p_full, s_full, BM25_TERMS, k=15).collect()
    assert [r.asDict() for r in via_incremental] == [
        r.asDict() for r in via_rebuild
    ]
    assert via_incremental


def test_bm25_term_filter_pushed(spark, sf_dir, tmp_path):
    """Serving reads ONLY the postings parquet (never the corpus) and
    the term predicate reaches the scan as a pushed filter."""
    docs = load_table(spark, sf_dir, "documents")
    postings, stats = build_bm25_index(docs)
    idx = str(tmp_path / "bm25_postings3")
    st = str(tmp_path / "bm25_stats3")
    postings.write.mode("overwrite").parquet(idx)
    stats.write.mode("overwrite").parquet(st)
    plan = (
        bm25_search_topk(
            spark.read.parquet(idx), spark.read.parquet(st), BM25_TERMS
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(term" in plan, plan[:2000]
    assert "documents" not in plan  # zero corpus touch at query time
