"""Standing-index keyword retrieval: build term postings ONCE, serve
top-k conjunctive queries from the index with no corpus scan.

The registered ``text_keyword_search_topk`` query (plans/
queries_text.py) is the scan-shaped oracle twin: it re-tokenizes
candidate documents per query so DuckDB can hash-compare it. This
module is the shape a retrieval service actually deploys at 100 TB:

- ``build_term_postings`` — one corpus tokenize → a (term, doc_id,
  tf) postings table, written ONCE (parquet, partition-bucketed by
  term). Cost amortizes over every subsequent query.
- ``keyword_search_topk`` — serves a query purely from the postings:
  an ``isin`` filter on the term column (a plain column predicate →
  parquet PushedFilters / row-group skipping when the postings are
  persisted), one groupBy at doc grain over only the matching
  postings, and a TakeOrderedAndProject top-k. The corpus is never
  touched.

Semantics match the registered query exactly: whitespace tokens of
``lower(text)``, conjunctive AND over the query terms, ranked by
total term frequency with doc_id tie-break —
``test_retrieval.py`` pins index-vs-scan equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_term_postings(documents: DataFrame) -> DataFrame:
    """(term, doc_id, tf): one row per distinct term per document.

    One explode + one (doc, term) shuffle — the same cost the scan
    path pays PER QUERY, paid once here. Persist with
    ``df.write.partitionBy(...)`` or sort/bucket by ``term`` so
    per-query term filters prune at the scan.
    """
    return (
        documents.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def keyword_search_topk(
    postings: DataFrame, terms: list[str], k: int = 10
) -> DataFrame:
    """(doc_id, total_tf, rank): top-k docs containing ALL ``terms``.

    Runs entirely on the postings table: the ``isin(terms)`` filter is
    a plain column predicate (pushed to the postings scan), the doc
    grain aggregate sees |terms| postings lists only, and the global
    top-k is TakeOrderedAndProject (per-partition heaps) with the
    rank stamped above the ``limit`` — never a full sort, never an
    unbounded global window.
    """
    qualified = (
        postings.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("total_tf"),
            F.count_distinct("term").alias("n_terms"),
        )
        .filter(F.col("n_terms") == len(terms))
    )
    top = (
        qualified.select("doc_id", F.col("total_tf").cast("long").alias("total_tf"))
        .orderBy(F.desc("total_tf"), F.asc("doc_id"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("total_tf"), F.asc("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("doc_id", "total_tf", "rank")
        .orderBy("rank")
    )
