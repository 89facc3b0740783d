"""Property-based checks (hypothesis) for the semantics the oracle
relies on: SAS date decode vs Python datetime, exact money aggregation
vs Decimal, dedup determinism under input shuffling."""

from __future__ import annotations

import pytest

import datetime as dt
import random
from decimal import Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from udacitycapstonedataengineer_spark.functions.dates import sas_date_decode
from udacitycapstonedataengineer_spark.functions.exact import money_avg, money_sum
from udacitycapstonedataengineer_spark.operators.cleaning import dedup_by_key

_SETTINGS = dict(max_examples=40, deadline=None)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=-7000, max_value=40000).map(float),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_sas_date_decode_matches_python(spark, days_list):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(days_list)],
        T.StructType(
            [
                T.StructField("i", T.IntegerType()),
                T.StructField("days", T.DoubleType()),
            ]
        ),
    )
    got = {
        r.i: r.d for r in df.select("i", sas_date_decode("days").alias("d")).collect()
    }
    epoch = dt.date(1960, 1, 1)
    for i, d in enumerate(days_list):
        # the reference's `if x`: both null and 0 decode to null
        want = None if (d is None or d == 0) else epoch + dt.timedelta(days=int(d))
        assert got[i] == want, (d, got[i], want)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=-10**7, max_value=10**7).map(
            lambda c: Decimal(c) / 100
        ),
        min_size=1,
        max_size=100,
    )
)
def test_money_sum_avg_exact(spark, amounts):
    df = spark.createDataFrame(
        [(float(a),) for a in amounts],
        T.StructType([T.StructField("v", T.DoubleType())]),
    )
    row = df.agg(
        money_sum("v").alias("s"), money_avg("v").alias("a")
    ).collect()[0]
    want_sum = sum(amounts)
    assert Decimal(str(row.s)).quantize(Decimal("0.01")) == want_sum.quantize(
        Decimal("0.01")
    )
    assert abs(row.a - float(want_sum) / len(amounts)) < 1e-9


def test_dedup_by_key_partition_invariant(spark):
    rows = [(k, o, random.random()) for k in range(20) for o in range(5)]
    random.Random(7).shuffle(rows)
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    outs = []
    for n_parts in (1, 3, 16):
        out = dedup_by_key(df.repartition(n_parts), keys=["k"], order_by=["o", "v"])
        outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 20 and all(o == 0 for _, o, _ in outs[0])

@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=600,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_chunk_windows_cover_and_align(spark, texts):
    """Chunking invariants for any ascii text (INCLUDING the empty
    string, which must yield zero chunks — not Spark's descending
    sequence(1,0) artifact): chunk i starts at (i-1)*stride+1, chunks
    are ≤ window chars, every character of the document appears in at
    least one chunk, and stripping the overlap reconstructs the
    document exactly."""
    from udacitycapstonedataengineer_spark.plans.queries_text import (
        chunk_windows,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    chunks = chunk_windows(df, stride=150, width=200).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk
    for i, t in enumerate(texts):
        if t == "":
            assert i not in by_doc  # empty doc → zero chunks
            continue
        got = by_doc[i]
        n = (len(t) - 1) // 150 + 1
        assert set(got) == set(range(1, n + 1))
        for cid, c in got.items():
            assert c == t[(cid - 1) * 150 : (cid - 1) * 150 + 200]
        # overlap-stripped reconstruction: first chunk + tail of the rest
        rebuilt = got[1] + "".join(got[c][50:] for c in range(2, n + 1))
        assert rebuilt == t


@settings(max_examples=25, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=60,
    )
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_connected_components_matches_union_find(spark, edges):
    """Hash-min label propagation must agree with a reference
    union-find on arbitrary small graphs — chains, cycles, stars,
    disconnected mixes, duplicate edges."""
    from udacitycapstonedataengineer_spark.operators.graph import (
        connected_components,
    )

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a), parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: min(m for m in parent if find(m) == find(n)) for n in parent}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.node: r.comp for r in connected_components(df, max_iter=40).collect()
    }
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),   # user
            st.integers(min_value=1, max_value=31),  # day of month
        ),
        min_size=1,
        max_size=60,
    )
)
def test_activity_bitmap_popcount_equals_distinct_days(spark, pairs):
    """popcount(bit_or(1 << day-1)) must equal count(DISTINCT day) —
    the identity that lets the bitmap replace the distinct set — and
    the bitmap must reconstruct the exact day set."""
    from udacitycapstonedataengineer_spark.plans.queries_round5d import (
        _events_activity_bitmap,
    )

    rows = [
        (u, dt.datetime(2024, 1, d, 12, 0, 0), i)
        for i, (u, d) in enumerate(pairs)
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long"
    )
    out = {
        r["user_id"]: r
        for r in _events_activity_bitmap.__wrapped__(spark, {"events": events}).collect()
    }
    expected: dict[int, set[int]] = {}
    for u, d in pairs:
        expected.setdefault(u, set()).add(d)
    assert set(out) == set(expected)
    for u, days in expected.items():
        r = out[u]
        assert r["active_days"] == len(days)
        assert r["activity_bitmap"] == sum(1 << (d - 1) for d in days)
        assert r["first_day"] == min(days) and r["last_day"] == max(days)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),          # user
            st.sampled_from(["a", "b", "c", "d"]),          # event type
        ),
        min_size=2,
        max_size=40,
    )
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_pagerank_mass_is_bounded_and_positive(spark, seq):
    """Fixed-point PageRank invariants on arbitrary event sequences:
    every rank >= the teleport base, and total mass never exceeds the
    fixed-point SCALE (truncating division only leaks mass; dangling
    nodes leak by design)."""
    from udacitycapstonedataengineer_spark.plans.queries_round5c import (
        _PR_SCALE,
        _graph_pagerank_eventtypes,
    )

    rows = [
        (u, dt.datetime(2024, 1, 1, 0, 0, i), i, typ)
        for i, (u, typ) in enumerate(seq)
    ]
    events = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    ranks = [
        r["rank_e12"]
        for r in _graph_pagerank_eventtypes.__wrapped__(spark, {"events": events}).collect()
    ]
    n = len(ranks)
    base = (15 * _PR_SCALE) // (100 * n)
    assert all(r >= base for r in ranks)
    assert sum(ranks) <= _PR_SCALE


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.sampled_from([f"i{k}" for k in range(30)]),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=2, max_value=12),
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_mg_two_pass_heavy_hitters_always_exact(spark, items, capacity):
    """For ANY input distribution and ANY capacity honoring the
    superset bound (capacity+1 > 1/θ), the two-pass output equals the
    brute-force exact answer — the guarantee that lets the sketch
    prune work without touching correctness. θ chosen from capacity:
    share_bp = ceil(10000/(capacity+1)) + 1 ensures the bound holds."""
    from udacitycapstonedataengineer_spark.operators.heavyhitters import (
        heavy_hitters_exact,
    )

    share_bp = -(-10_000 // (capacity + 1)) + 1
    df = spark.createDataFrame([(x,) for x in items], "item string").repartition(3)
    got = {
        (r["item"], r["n"])
        for r in heavy_hitters_exact(
            df, F.col("item"), share_bp=share_bp, capacity=capacity
        ).collect()
    }
    n_total = len(items)
    from collections import Counter

    brute = {
        (k, c)
        for k, c in Counter(items).items()
        if c * 10_000 >= share_bp * n_total
    }
    assert got == brute


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),        # user
            st.integers(min_value=0, max_value=12 * 24 * 3600),  # sec offset
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=50_000),   # cents
        ),
        min_size=2,
        max_size=120,
    )
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_attribution_daygrain_rewrite_equivalence(spark, rows):
    """The day-grain attribution rewrite must equal the naive
    formulation on ARBITRARY event layouts — including events exactly
    at the window edges (ts == pts-7d is in, ts == pts is out),
    same-timestamp purchases, and multi-purchase users. The shared
    oracle pins both to DuckDB at two fixed datasets; this pins them
    to EACH OTHER under adversarial inputs."""
    import datetime as dt

    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    data = [
        (
            i,
            t0 + dt.timedelta(seconds=sec),
            int(user),
            typ,
            cents / 100.0,
            "{}",
        )
        for i, (user, sec, typ, cents) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    naive_fn = QUERIES["events_linear_attribution"].__wrapped__
    dg_fn = QUERIES["events_linear_attribution_daygrain"].__wrapped__
    tables = {"events": df}
    naive = {
        (r["event_type"], r["n_attributions"], r["attributed_cents"])
        for r in naive_fn(spark, tables).collect()
    }
    daygrain = {
        (r["event_type"], r["n_attributions"], r["attributed_cents"])
        for r in dg_fn(spark, tables).collect()
    }
    assert naive == daygrain


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),        # customer
            st.integers(min_value=0, max_value=6 * 365),  # day offset
            st.integers(min_value=100, max_value=900_000),  # cents
        ),
        min_size=2,
        max_size=100,
    )
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_incremental_ltv_equals_full_recompute(spark, rows):
    """The presence-table delta merge must equal the full cohort
    recompute on ARBITRARY order histories — customers active across
    the split, delta-only customers, multi-year gaps. The shared
    oracle pins both at fixed datasets; this pins them to each other
    (the split date falls mid-range, so both sides are exercised)."""
    import datetime as dt

    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    t0 = dt.datetime(1995, 1, 1)
    data = [
        (i, int(cust), "F", cents / 100.0,
         t0 + dt.timedelta(days=day), "1-URGENT")
        for i, (cust, day, cents) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    tables = {"orders": df}
    full_fn = QUERIES["orders_cohort_ltv"].__wrapped__
    inc_fn = QUERIES["orders_cohort_ltv_incremental"].__wrapped__
    full = {tuple(r) for r in full_fn(spark, tables).collect()}
    inc = {tuple(r) for r in inc_fn(spark, tables).collect()}
    assert full == inc


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),          # customer
            st.integers(min_value=0, max_value=3 * 365),    # day offset
            st.integers(min_value=9_000, max_value=11_000),  # cents
        ),
        min_size=2,
        max_size=60,
    )
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_banded_invoice_join_equals_plain_join(spark, rows):
    """The month-banded duplicate-invoice join must equal the plain
    non-equi formulation on arbitrary order layouts — including pairs
    spanning TWO month boundaries (Jan 31 → Mar 2 across February),
    which a month-±1 band provably misses. Amounts cluster in a
    narrow range so the 2% band fires often."""
    import datetime as dt

    from pyspark.sql import functions as F

    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    t0 = dt.datetime(1995, 1, 1)
    data = [
        (i, int(cust), "F", cents / 100.0,
         t0 + dt.timedelta(days=day), "1-URGENT")
        for i, (cust, day, cents) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    banded_fn = QUERIES["orders_duplicate_invoice_pairs"].__wrapped__
    banded = {tuple(r) for r in banded_fn(spark, {"orders": df}).collect()}
    o = df.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.to_date("o_orderdate").alias("d"),
    )
    a = o.select(
        F.col("o_custkey").alias("ck"), F.col("cents").alias("ca"),
        F.col("o_orderkey").alias("ka"), F.col("d").alias("da"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck2"), F.col("cents").alias("cb"),
        F.col("o_orderkey").alias("kb"), F.col("d").alias("db"),
    )
    plain = {
        tuple(r)
        for r in a.join(
            b,
            (F.col("ck") == F.col("ck2"))
            & (F.col("ka") < F.col("kb"))
            & (F.abs(F.col("ca") - F.col("cb")) * 50 <= F.col("ca"))
            & (F.abs(F.datediff("db", "da")) <= 30),
        )
        .select(
            F.col("ck").alias("o_custkey"), F.col("ka").alias("orderkey_a"),
            F.col("kb").alias("orderkey_b"), F.col("ca").alias("cents_a"),
            F.col("cb").alias("cents_b"),
            F.datediff("db", "da").cast("int").alias("day_gap"),
        )
        .collect()
    }
    assert banded == plain


def test_banded_invoice_join_catches_double_month_boundary(spark):
    """The deterministic regression case: Jan 31 and Mar 2 1995 are 30
    days apart but two month-buckets apart — a ±1 band misses them."""
    import datetime as dt

    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    df = spark.createDataFrame(
        [
            (1, 7, "F", 100.0, dt.datetime(1995, 1, 31), "1-URGENT"),
            (2, 7, "F", 100.5, dt.datetime(1995, 3, 2), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    fn = QUERIES["orders_duplicate_invoice_pairs"].__wrapped__
    rows = fn(spark, {"orders": df}).collect()
    assert len(rows) == 1 and rows[0]["day_gap"] == 30


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),        # month index
            st.integers(min_value=1, max_value=10**7),    # cents
        ),
        min_size=1,
        max_size=80,
    )
)
def test_price_bands_match_sorted_reference(spark, rows):
    """The rank-extraction quantiles must equal the plain sorted-list
    definition (value at rank ceil(p·n), 1-indexed) on arbitrary
    inputs — duplicates, single-row months, all-equal values."""
    import datetime as dt

    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    data = [
        (i, 1, "F", cents / 100.0,
         dt.datetime(1995, 1 + m, 15), "1-URGENT")
        for i, (m, cents) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    fn = QUERIES["orders_monthly_price_bands"].__wrapped__
    got = {
        r["ym"]: (r["n_orders"], r["p50_cents"], r["p90_cents"],
                  r["p99_cents"])
        for r in fn(spark, {"orders": df}).collect()
    }
    by_month: dict[int, list[int]] = {}
    for i, (m, cents) in enumerate(rows):
        by_month.setdefault(199501 + m, []).append(cents)
    for ym, vals in by_month.items():
        vals.sort()
        n = len(vals)
        ref = (
            n,
            vals[(n + 1) // 2 - 1],
            vals[(9 * n + 9) // 10 - 1],
            vals[(99 * n + 99) // 100 - 1],
        )
        assert got[ym] == ref, (ym, got[ym], ref)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=500),
        min_size=35,
        max_size=120,
    )
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_daily_autocorr_matches_numpy(spark, counts):
    """The exact-moment autocorrelation must match numpy's corrcoef on
    the same lagged pairs (different summation order, so compare to
    1e-9 — the ORACLE pins cross-engine bit-equality; this pins the
    formula itself)."""
    import datetime as dt

    import numpy as np

    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    t0 = dt.datetime(1995, 1, 1)
    data = []
    oid = 0
    for day, n in enumerate(counts):
        for _ in range(n % 5):  # keep volume small but varying
            data.append(
                (oid, 1, "F", 10.0, t0 + dt.timedelta(days=day), "1-URGENT")
            )
            oid += 1
    if not data:
        return
    df = spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    fn = QUERIES["orders_daily_autocorr"].__wrapped__
    got = {r["lag_days"]: (r["n_pairs"], r["autocorr"])
           for r in fn(spark, {"orders": df}).collect()}
    # rebuild the daily series and lagged pairs in python
    daily: dict[int, int] = {}
    for day, n in enumerate(counts):
        if n % 5:
            daily[day] = n % 5
    for lag in (1, 7, 28):
        pairs = [(daily[d], daily[d + lag]) for d in daily if d + lag in daily]
        if lag not in got:
            assert len(pairs) == 0 or len(set(pairs)) >= 0
            continue
        n_pairs, r = got[lag]
        assert n_pairs == len(pairs)
        x = np.array([p[0] for p in pairs], dtype=float)
        y = np.array([p[1] for p in pairs], dtype=float)
        if r is None or (isinstance(r, float) and r != r):
            # degenerate variance — numpy would warn/NaN too
            assert x.std() == 0 or y.std() == 0 or len(pairs) < 2
        else:
            ref = np.corrcoef(x, y)[0, 1]
            assert abs(r - ref) < 1e-9, (lag, r, ref)


def test_heavy_hitters_invariant_to_partition_layout(spark, sf_dir):
    """The two-pass output must be EXACTLY the same under any
    partitioning — the MG candidate sets differ by layout, but the
    exact verify pass erases that difference (the design's core
    determinism claim)."""
    from udacitycapstonedataengineer_spark.operators.heavyhitters import (
        heavy_hitters_exact,
    )
    from udacitycapstonedataengineer_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events")
    item = F.get_json_object("props", "$.k").cast("long").cast("string")
    outs = []
    for parts in (1, 3, 17):
        rows = heavy_hitters_exact(
            events.repartition(parts), item, share_bp=105
        ).collect()
        outs.append({(r["item"], r["n"], r["n_total"]) for r in rows})
    assert outs[0] == outs[1] == outs[2]
    assert outs[0]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=9),
        min_size=1,
        max_size=60,
    )
)
def test_drawdown_matches_running_max_reference(spark, day_counts):
    """The drawdown series must equal the plain running-max reference
    on arbitrary day sequences (monotone rises, deep troughs,
    single-day series)."""
    import datetime as dt

    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    t0 = dt.datetime(1995, 1, 1)
    data = []
    oid = 0
    for day, n in enumerate(day_counts):
        for _ in range(n):
            data.append(
                (oid, 1, "F", 10.0, t0 + dt.timedelta(days=day), "1-URGENT")
            )
            oid += 1
    df = spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    fn = QUERIES["orders_daily_drawdown"].__wrapped__
    got = [
        (r["n"], r["peak"], r["drawdown_bp"])
        for r in fn(spark, {"orders": df}).collect()
    ]
    peak, want = 0, []
    for n in day_counts:
        peak = max(peak, n)
        want.append((n, peak, (peak - n) * 10000 // peak))
    assert got == want


@settings(max_examples=120, deadline=None)
@given(
    st.dictionaries(
        st.text(
            alphabet=st.sampled_from("abcdef"), min_size=1, max_size=6
        ),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=12,
    ),
    st.sampled_from([1, 2, 4, 32]),
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_batched_bpe_equals_sequential_reference(spark, corpus, batch_k):
    """The batched trainer's stop-at-first-interaction rule must
    reproduce the SEQUENTIAL merge sequence exactly on arbitrary
    corpora — including interacting-pair and tie-heavy shapes
    hypothesis likes to generate."""
    from tests.test_bpe import _reference_bpe
    from udacitycapstonedataengineer_spark.operators.bpe import (
        train_bpe_batched,
    )

    df = spark.createDataFrame(list(corpus.items()), "w string, f long")
    want = _reference_bpe(corpus, n_merges=8)
    got = train_bpe_batched(df, n_merges=8, batch_k=batch_k)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    vecs=st.lists(
        st.tuples(
            st.sampled_from([-1.0, -0.5, 0.25, 0.5, 1.0]),
            st.sampled_from([-1.0, -0.5, 0.25, 0.5, 1.0]),
            st.sampled_from([-1.0, -0.5, 0.25, 0.5, 1.0]),
            st.sampled_from([-1.0, -0.5, 0.25, 0.5, 1.0]),
        ),
        min_size=6,
        max_size=16,
    )
)
@pytest.mark.slow  # VERDICT r16 next #2: multi-minute, opt-in tier
def test_semdedup_incremental_survivors_matches_reference(spark, vecs):
    """The incremental SemDeDup decision layer against an independent
    pure-Python reimplementation: given Spark's own frozen model
    (centroids + cell assignments), re-derive the standing survivor
    set and the corpus_dup / batch_dup / novel classification with a
    union-find and the same sequential-fold cosine, and require exact
    agreement row-for-row. Covers glued components, cells with no
    survivors, threshold boundary cosines, and empty batch-pair sets —
    the states the r9 convergence bug taught us to enumerate."""
    import math

    from udacitycapstonedataengineer_spark.operators.clustering import (
        _as_double_vec,
        kmeans_assign,
        kmeans_fit,
    )
    from udacitycapstonedataengineer_spark.plans import queries  # noqa: F401
    from udacitycapstonedataengineer_spark.plans.queries_round10 import (
        semdedup_incremental_survivors,
    )

    k, iters, dim, threshold = 2, 2, 4, 0.5
    rows = [(i, list(v), f"l{i % 2}") for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    corpus = emb.filter("vec_id % 3 != 0")
    batch = emb.filter("vec_id % 3 = 0")

    got = {
        r["vec_id"]: (r["label"], r["reason"], r["kept"])
        for r in semdedup_incremental_survivors(
            corpus, batch, k=k, iters=iters, dim=dim, threshold=threshold
        ).collect()
    }

    # ---- independent reference: same model, pure-Python decision ----
    vectors, centroids = kmeans_fit(corpus, k=k, iters=iters, dim=dim)
    c_cell = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(vectors, centroids).collect()
    }
    b_cell = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(
            _as_double_vec(batch, "embedding"), centroids
        ).collect()
    }
    v = {i: vec for i, vec, _ in rows}
    lab = {i: la for i, _, la in rows}

    def cos(a, b):  # the engine's sequential folds, replayed exactly
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = 0.0
        for x in a:
            na += float(x) * float(x)
        nb = 0.0
        for y in b:
            nb += float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    cids = sorted(c_cell)
    for i in cids:
        for j in cids:
            if i < j and c_cell[i] == c_cell[j] and cos(v[i], v[j]) >= threshold:
                union(i, j)
    comp_min = {}
    for i in cids:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    survivors = {i for i in cids if comp_min[find(i)] == i}

    bids = sorted(b_cell)
    hit = {
        b
        for b in bids
        if any(
            c_cell[s] == b_cell[b] and cos(v[s], v[b]) >= threshold
            for s in survivors
        )
    }
    passed = [b for b in bids if b not in hit]
    parent = {}
    for i in passed:
        for j in passed:
            if i < j and b_cell[i] == b_cell[j] and cos(v[i], v[j]) >= threshold:
                union(i, j)
    comp_min = {}
    for i in passed:
        r = find(i)
        comp_min[r] = min(comp_min.get(r, i), i)
    bdrop = {i for i in passed if comp_min[find(i)] != i}

    want = {}
    for b in bids:
        reason = (
            "corpus_dup" if b in hit else
            "batch_dup" if b in bdrop else "novel"
        )
        want[b] = (lab[b], reason, reason == "novel")

    assert got == want
