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
    window = E._DRIVER_WINDOW
    assert len(window) == 50
    assert window == E._PRIORITY[:50]
    unoracled = [n for n in window if n not in ORACLE]
    assert not unoracled, unoracled


def test_must_check_tiers_fit_inside_window():
    """ADVICE r5: the round-5 boundary comment drifted to slot 51 and
    silently dropped a query from driver verification. The never-
    checked / re-earn / new-this-round tiers must ALL land inside the
    50-row window — if they outgrow it, the rotation must split across
    rounds explicitly, not truncate silently."""
    must = E._NEW_R15
    window = set(E._DRIVER_WINDOW)
    dropped = [n for n in must if n not in window]
    assert not dropped, f"must-check queries outside driver window: {dropped}"


def test_no_registered_query_starves():
    """Every registered query is either already driver-green in a
    committed CORRECTNESS_r*.json or sits inside this round's window —
    the invariant the round-5 miscount broke."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(f)).items():
            if row.get("rows_match") and row.get("schema_match"):
                green.add(name)
    if not green:  # fresh clone without driver artifacts
        return
    window = set(E._DRIVER_WINDOW)
    starved = [n for n in QUERIES if n not in green and n not in window]
    assert not starved, f"never-checked and outside window: {starved}"


def test_stalest_cohort_rotates():
    """VERDICT r7 #1/#3 (wrong #: flaw 3): the rotation backlog was
    hand-counted in a comment and drifted (said 9, data said 16). The
    count is now DERIVED: compute each query's latest driver-green
    round from the raw committed CORRECTNESS_r*.json files; every
    query in the STALEST cohort (minimum latest-green round) must sit
    inside this round's driver window — the stalest queries can never
    be skipped by a mis-counted comment again.

    Only rounds BELOW E._ROUND count (ADVICE r8): the driver commits
    CORRECTNESS_r{_ROUND}.json at round CLOSE, but the window only
    rotates at the NEXT round open — without the exclusion this gate
    is guaranteed-red between those two moments for a reason the
    window already documents."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if rnd >= E._ROUND:
            continue
        for name, row in json.load(open(f)).items():
            if row.get("rows_match") and row.get("schema_match"):
                last[name] = max(last.get(name, 0), rnd)
    stale = {n: r for n, r in last.items() if n in QUERIES}
    if not stale:
        return
    oldest = min(stale.values())
    cohort = sorted(n for n, r in stale.items() if r == oldest)
    window = set(E._DRIVER_WINDOW)
    missed = [n for n in cohort if n not in window]
    assert not missed, (
        f"stalest cohort (last green r{oldest:02d}) not fully rotated: "
        f"{missed}"
    )


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


def test_oracle_comparator_detects_drift():
    """The gate's own sensitivity: one changed value, one float ulp,
    one extra row, one renamed column — each must fail the compare.
    (A comparator that silently passes drift would make every green
    row above meaningless.)"""
    import math

    import pandas as pd
    import pytest

    from tests.oracle_check import compare_frames

    base = pd.DataFrame({"k": [1, 2], "v": [1.5, 2.5]})
    compare_frames(base.copy(), base.copy(), "same")  # sanity

    changed = base.copy()
    changed.loc[1, "v"] = 2.6
    with pytest.raises(AssertionError):
        compare_frames(base, changed, "value")

    ulp = base.copy()
    ulp.loc[0, "v"] = math.nextafter(1.5, 2.0)
    with pytest.raises(AssertionError):
        compare_frames(base, ulp, "ulp")

    extra = pd.concat([base, base.iloc[[0]]], ignore_index=True)
    with pytest.raises(AssertionError):
        compare_frames(base, extra, "rows")

    renamed = base.rename(columns={"v": "w"})
    with pytest.raises(AssertionError):
        compare_frames(base, renamed, "cols")


def test_bench_and_probe_names_are_registered():
    """bench.py skips unknown names silently and the probe would
    KeyError at runtime — a typo in either list must fail here, not
    drop a benchmark on the floor."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    bench = load("bench_mod", os.path.join(root, "bench.py"))
    probe = load(
        "probe_mod", os.path.join(root, "scripts", "scale_probe.py")
    )
    missing_b = [n for n in bench.HEADLINE if n not in QUERIES]
    missing_p = [n for n in probe.PROBE_QUERIES if n not in QUERIES]
    assert not missing_b, f"bench names not registered: {missing_b}"
    assert not missing_p, f"probe names not registered: {missing_p}"
    # the canary runs first/last every session — an unregistered name
    # would crash the bench before any timing lands
    assert bench.CANARY in QUERIES
    # and no duplicates padding the lists
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
    assert len(probe.PROBE_QUERIES) == len(set(probe.PROBE_QUERIES))
