"""Every oracled query must match its DuckDB twin — the same gate the
driver applies at sf0.01, run here at sf0.001 for speed."""

from __future__ import annotations

import pytest

from udacitycapstonedataengineer_spark.plans.queries import ORACLE, QUERIES

from .oracle_check import assert_parity


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_parity(spark, sf_dir, name):
    assert_parity(spark, name, sf_dir)


def test_every_query_runs(spark, sf_dir):
    """Queries without an oracle still must execute and return rows."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
