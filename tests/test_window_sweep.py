"""Registry-wide unpartitioned-window gate (VERDICT r4 #3).

A ``windowspecdefinition`` with no PARTITION BY funnels its whole
input through one task — the classic Spark scale trap. Every site in
this repo is bounded by construction, but until this test that was a
convention; now it's a gate: a future registered query that adds an
unbounded global-order window over fact-grain data FAILS here.

The detection logic lives in ``plans/doctor.py`` (the reusable plan
screen); this test runs its global-window rule over every registered
query. A global window is accepted only when one of these holds:

1. a Limit/TakeOrdered sits BELOW it in the plan tree (rank-stamping
   a top-k after ``.limit(k)``);
2. it orders by the synthetic ``__pid`` column — the distributed
   exact-ranking offset scheme (operators/ranking.py), whose input is
   one row per shuffle partition;
3. the query is in the explicit allowlist of known-bounded inputs
   (small-dim surrogate keys, calendar-bounded spines), each with a
   stated reason.
"""

from __future__ import annotations

import pytest

from udacitycapstonedataengineer_spark.plans.doctor import (
    has_limit_below,
    orders_by_pid,
    unpartitioned_windows,
)
from udacitycapstonedataengineer_spark.plans.queries import QUERIES

# queries whose global windows run over inputs that are small by
# construction — the window input grain is the reason
ALLOWED_BOUNDED_INPUT = {
    # row_number surrogate ids over .distinct() of low-cardinality
    # dimension columns (operators/dims.py): priorities (5), languages
    # (handful), distinct order dates (calendar-bounded)
    "priority_dim": "surrogate id over 5 distinct order priorities",
    "fact_orders": "surrogate id over 5 distinct order priorities",
    "sql_fact_dim_join": "surrogate id over 5 distinct order priorities",
    "join_string_keys": "surrogate id over distinct language codes",
    "calendar_dim": "surrogate id over distinct dates (calendar-bounded)",
    # lag-12 seasonality over the month spine — rows = months in range
    "orders_monthly_seasonality": "lag window over month-grain spine",
    # ±1-delta running sum over the DAY-grain backlog table — rows =
    # days in the order/ship calendar (~2.4k), never fact grain
    "orders_open_backlog_daily": "running sum over day-grain spine",
    # MAD rank extraction over the DAY-grain residual table — rows =
    # days in the event calendar, never fact grain
    "events_daily_anomaly_seasonal": "MAD rank over day-grain residuals",
    # running max over the DAY-grain series — calendar-bounded
    "orders_daily_drawdown": "running peak over day-grain series",
    # median rank over the 10-minute-WINDOW-grain table — calendar-
    # bounded (windows in range, never event grain)
    "events_error_burst_windows": "median rank over window-grain table",
}


@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_no_unbounded_global_window_in_any_registered_query(spark, sf_dir):
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    violations: dict[str, list[str]] = {}
    seen_allowlisted: set[str] = set()
    for name, q in QUERIES.items():
        plan = q(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        lines = plan.splitlines()
        for i in unpartitioned_windows(lines):
            if has_limit_below(lines, i):
                continue
            if orders_by_pid(lines[i]):
                continue
            if name in ALLOWED_BOUNDED_INPUT:
                seen_allowlisted.add(name)
                continue
            violations.setdefault(name, []).append(lines[i].strip()[:160])
    assert not violations, (
        "unbounded global-order window(s) in registered queries — either "
        "rewrite via operators/ranking.py or justify in "
        f"ALLOWED_BOUNDED_INPUT: {violations}"
    )
    # the allowlist must not go stale: every entry still exists and
    # still exercises a global window
    stale = set(ALLOWED_BOUNDED_INPUT) - seen_allowlisted
    assert not stale, f"allowlist entries no longer needed: {stale}"
