"""PySpark-native analytics engine with the query & data-processing
capabilities of DiegoFranca99/udacitycapstonedataengineer.

The reference is a notebook-grade batch ETL star-schema pipeline
(I-94 immigration fact + 4 dimensions). This package re-expresses
every operator it exercises (SURVEY.md §2) as idiomatic Spark 3.x/4.x
DataFrame code — declared plans that Catalyst optimizes — plus the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB deployment needs.

Layout:
    session.py    SparkSession factory (AQE, UTC, shuffle sizing)
    sources/      schema'd readers (CSV/Parquet) + partitioned writers
    operators/    cleaning, dims, fact, dedup, similarity
    functions/    date decode, exact-money aggregation, text, vectors
    plans/        star-schema pipeline + data-quality checks
    streaming/    windowed/sessionized event processing
"""

__version__ = "0.1.0"

# registers the exit-time cleanup + stale-pid sweep for the served
# queries' pid-scoped temp index dirs (ADVICE r11 #1) — import side
# effect on purpose, so every entrypoint (driver, bench, pytest) gets
# the lifecycle without touching committed query text
from . import tmpindex as _tmpindex  # noqa: E402,F401
