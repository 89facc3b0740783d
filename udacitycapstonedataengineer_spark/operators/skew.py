"""Skew-handling join utilities.

AQE's skew-join splitting (enabled in session.py) is the first line of
defense, but it only helps sort-merge joins after a shuffle exists.
``salted_join`` is the explicit control for the remaining case: a
large→medium join where the medium side is too big to broadcast and a
handful of hot keys would pin single reducers. Salting trades an
R-fold replication of the medium side for an even spread of each hot
key across R reducers.

The salt is a deterministic hash of a high-cardinality column (NOT
``rand()``): deterministic plans re-run identically, results stay
oracle-checkable, and a uniform hash spreads as well as randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    medium: DataFrame,
    on: str,
    spread_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ medium ON on`` with the large side's hot
    keys spread across ``n_salts`` reducers.

    ``spread_col`` is any high-cardinality column of ``large`` (a row
    id, line number…) whose hash distributes rows of the SAME join key
    across salts. The medium side is replicated n_salts times via an
    explode — total shuffle volume grows by |medium|·(n_salts-1),
    bounded and chosen by the caller; the win is that no reducer sees
    more than ~1/n_salts of any hot key.
    """
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts)).cast("int")
    )
    salted_medium = medium.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    out = salted_large.join(salted_medium, [on, "__salt"], how)
    return out.drop("__salt")
