"""Driver-contract invariants for __spark_entry__ (the ordering IS the
contract: the correctness driver checks a fixed ~50-row prefix)."""

from __future__ import annotations

import __spark_entry__ as E
from udacitycapstonedataengineer_spark.plans.queries import ORACLE, QUERIES


def test_priority_names_are_registered():
    unknown = [n for n in E._PRIORITY if n not in QUERIES]
    assert not unknown, f"_PRIORITY references unregistered queries: {unknown}"


def test_priority_has_no_duplicates():
    assert len(E._PRIORITY) == len(set(E._PRIORITY))


def test_driver_window_is_exactly_50_and_oracled():
    """The checked prefix must stay exactly 50 entries, every one
    oracled — an unoracled query in the window burns a slot on a
    rows-only check."""
    window = E._PRIORITY[:50]
    assert len(window) == 50
    unoracled = [n for n in window if n not in ORACLE]
    assert not unoracled, unoracled


def test_queries_covers_every_registered_query():
    q = E.queries()
    assert set(q) == set(QUERIES)
    # oracle_sql is a subset keyed identically
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert set(o) == set(ORACLE)


def test_every_registered_query_is_oracled():
    """Round-4 invariant: 100% oracle coverage (interval-assertion
    oracles included). A new rows-only query is a regression."""
    missing = [n for n in QUERIES if n not in ORACLE]
    assert not missing, f"queries without oracles: {missing}"
