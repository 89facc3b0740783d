"""Grouped-map Pandas operators (``applyInPandas``).

The third Python-surface tier after scalar pandas_udf and mapInPandas:
a whole group arrives as one pandas DataFrame, so cross-row logic that
has no native expression (iterative fits, per-group model scoring,
library calls) can run vectorized per group.

Scale contract: applyInPandas shuffles on the group key and each group
must fit in one executor's memory. That's fine for many mid-cardinality
keys; for LOW-cardinality keys (like the ~20 sources here at 100 TB)
groups grow unboundedly — prefer the native window/aggregate form, or
pre-aggregate, whenever the math allows. This module keeps the math
deliberately oracle-checkable (median is linear-interpolated in pandas
and DuckDB alike) so the pandas path itself is hash-verified.
"""

from __future__ import annotations

from typing import Iterator  # noqa: F401  (mirrors sibling modules)

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DEV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("median_chars", T.DoubleType()),
        T.StructField("dev_chars", T.DoubleType()),
    ]
)


def per_source_length_dev(documents: DataFrame) -> DataFrame:
    """Per-source median document length and each doc's deviation from
    it — the grouped-map shape: the median needs the whole group, the
    output is per-row. pandas' interpolated median matches DuckDB's
    ``median`` window aggregate exactly on integer inputs, so this
    Python-side operator is still oracle-checked bit-for-bit.
    """

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        med = float(pdf["n_chars"].median())
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "n_chars": pdf["n_chars"],
                "median_chars": med,
                "dev_chars": pdf["n_chars"].astype("float64") - med,
            }
        )

    return (
        documents.select("doc_id", "source", "n_chars")
        .groupBy("source")
        .applyInPandas(fit, schema=DEV_SCHEMA)
    )
