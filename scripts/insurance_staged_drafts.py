"""sf0.01 PLAIN-session insurance for the staged r17 + r18 drafts
(VERDICT r15 next #4 — the shape that caught the r16 funnel collapse
and the HUGEINT dtype drift while those drafts were still staged).

A plain SparkSession (the grading driver's shape, not the package
factory) at sf0.01, each draft body compared against its DuckDB twin
with the tightened comparator. Zero-row results fail loudly — an
empty result trivially hash-matches and proves nothing.

Usage: python scripts/insurance_staged_drafts.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession  # noqa: E402

import udacitycapstonedataengineer_spark.plans.queries as Q  # noqa: E402
from udacitycapstonedataengineer_spark.plans.queries_round17 import (  # noqa: E402
    _events_sessionize_stream_served_draft,
    _text_bm25_indexed_incremental_draft,
    _text_bm25_indexed_served_draft,
)
from udacitycapstonedataengineer_spark.plans.queries_round18 import (  # noqa: E402
    _corpus_pipeline_tokenshard_draft,
    _corpus_pipeline_tokenshard_oracle_sql,
    _text_bm25_drift_rebuild_draft,
    _text_bm25_drift_rebuild_oracle_sql,
)
from udacitycapstonedataengineer_spark.session import (  # noqa: E402
    pin_oracle_semantics,
)
from udacitycapstonedataengineer_spark.sources.readers import (  # noqa: E402
    load_tables,
)

from tests.oracle_check import compare_frames, run_oracle  # noqa: E402

SF = "/root/testdata/sf0.01"

CHECKS = {
    # the r17 BM25 pair serves under the UNCHANGED scan-twin oracle —
    # hash equality proves append == rebuild == scan == DuckDB
    "text_bm25_indexed_incremental": (
        _text_bm25_indexed_incremental_draft,
        lambda: Q.ORACLE["text_bm25_linear_topk"],
    ),
    "text_bm25_indexed_served": (
        _text_bm25_indexed_served_draft,
        lambda: Q.ORACLE["text_bm25_linear_topk"],
    ),
    # the r17 stream row reshapes to the registered batch output
    "events_sessionize_stream_served": (
        _events_sessionize_stream_served_draft,
        lambda: Q.ORACLE["events_sessionize"],
    ),
    "corpus_pipeline_tokenshard": (
        _corpus_pipeline_tokenshard_draft,
        _corpus_pipeline_tokenshard_oracle_sql,
    ),
    "text_bm25_drift_rebuild": (
        _text_bm25_drift_rebuild_draft,
        _text_bm25_drift_rebuild_oracle_sql,
    ),
}


def main() -> None:
    names = sys.argv[1:] or list(CHECKS)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("insurance-staged-drafts")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    pin_oracle_semantics(spark)
    t = load_tables(spark, SF)
    bad = 0
    for name in names:
        fn, sql_fn = CHECKS[name]
        try:
            df = fn(spark, t).toPandas()
            if len(df) == 0:
                raise AssertionError("zero-row result (vacuous oracle)")
            compare_frames(df, run_oracle(sql_fn(), SF), name)
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"FAIL {name}: {e}", flush=True)
            continue
        print(f"OK   {name} rows={len(df)}", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
