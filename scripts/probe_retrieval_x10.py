"""×10 scale probe for the r17 BM25 pair (VERDICT r15 next #4) and
the r18-staged drafts (the staging-evidence discipline
scripts/probe_pipeline_x10.py established):

- ``text_bm25_indexed_incremental`` — standing index + batch append +
  additive stats merge. Expected near-linear: the two tokenize
  aggregates are corpus/batch scans; serving is O(postings-of-terms).
- ``text_bm25_indexed_served`` — index write (term-range-partitioned)
  + read-back serving. Write is corpus-linear, serving pruned.
- ``corpus_pipeline_tokenshard`` — pipeline mix → chunk → tokenize →
  REAL tokenshard write + read-back report. Expected to track the
  registered pipeline report (~2× at ×10, budgeted-SemDeDup
  dominated) plus a corpus-linear pack stage.
- ``text_bm25_drift_rebuild`` — two serving paths over ONE pruned
  postings scan; rank windows on k rows. Expected ~ the indexed
  twins' build cost.

Runs each DRAFT BODY verbatim at sf0.1 and the SF-proportional
×``factor`` replica (scale_probe.build_scaled). Usage:
python scripts/probe_retrieval_x10.py [factor]. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import udacitycapstonedataengineer_spark.plans.queries  # noqa: E402,F401
from udacitycapstonedataengineer_spark.plans.queries_round17 import (  # noqa: E402
    _text_bm25_indexed_incremental_draft,
    _text_bm25_indexed_served_draft,
)
from udacitycapstonedataengineer_spark.plans.queries_round18 import (  # noqa: E402
    _corpus_pipeline_tokenshard_draft,
    _text_bm25_drift_rebuild_draft,
)
from udacitycapstonedataengineer_spark.session import get_spark  # noqa: E402
from udacitycapstonedataengineer_spark.sources.readers import (  # noqa: E402
    load_tables,
)

from scale_probe import build_scaled  # noqa: E402

DRAFTS = {
    "bm25_incremental": _text_bm25_indexed_incremental_draft,
    "bm25_served": _text_bm25_indexed_served_draft,
    "pipe_tokenshard": _corpus_pipeline_tokenshard_draft,
    "bm25_drift": _text_bm25_drift_rebuild_draft,
}


def _sweep(spark) -> None:
    spark.catalog.clearCache()
    for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        jrdd.unpersist()


def _run(spark, sf_dir: str) -> dict:
    t = load_tables(spark, sf_dir)
    out: dict = {"n_docs": t["documents"].count()}
    for key, fn in DRAFTS.items():
        t0 = time.perf_counter()
        rows = fn(spark, t).collect()
        out[f"{key}_sec"] = round(time.perf_counter() - t0, 3)
        out[f"{key}_rows"] = len(rows)
        _sweep(spark)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaled = f"/tmp/scale_probe_v2_x{factor}"
    spark = get_spark(
        app_name="probe-retrieval-x10",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled(spark, base, scaled, factor)

    res = {"factor": factor}
    # warm the JVM once so the base reading isn't codegen-dominated
    _run(spark, base)
    res["base"] = _run(spark, base)
    res["scaled"] = _run(spark, scaled)
    for key in DRAFTS:
        res[f"{key}_ratio"] = round(
            res["scaled"][f"{key}_sec"] / res["base"][f"{key}_sec"], 2
        )
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    main()
