"""Mergeable-sketch contracts: merge-equality (the incremental-rollup
algebra) and error bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.operators.sketches import (
    hll_daily_distinct,
    hll_merge_estimate,
    kll_value_quantiles,
    theta_distinct_by_source,
)
from udacitycapstonedataengineer_spark.sources.readers import load_table


def test_hll_merge_equals_direct_and_bounds(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = hll_daily_distinct(ev)
    merged = hll_merge_estimate(daily).collect()[0].est_distinct
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
    ).collect()[0][0]
    # the mergeability contract: union of daily sketches == one pass
    assert merged == direct
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.05  # lg_k=12 → ~1.6% rse
    # determinism across layouts (sketches are order-insensitive)
    merged2 = hll_merge_estimate(hll_daily_distinct(ev.repartition(13))).collect()[0].est_distinct
    assert merged2 == merged


def test_kll_quantiles_within_rank_error(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    q = kll_value_quantiles(ev).collect()[0]
    vals = sorted(r.value for r in ev.select("value").collect())
    n = len(vals)
    for p, got in ((0.5, q.q50), (0.9, q.q90), (0.99, q.q99)):
        # default k=200 → ~1.65% rank error (99% conf); allow 3%
        lo = vals[max(0, int((p - 0.03) * n) - 1)]
        hi = vals[min(n - 1, int((p + 0.03) * n))]
        assert lo <= got <= hi, (p, got, lo, hi)


def test_theta_per_source_sums_near_exact(spark, sf_dir):
    from udacitycapstonedataengineer_spark.functions.text import fingerprint

    docs = load_table(spark, sf_dir, "documents").select(
        "source", fingerprint().alias("fingerprint")
    )
    per_source = {r.source: r.est_distinct for r in theta_distinct_by_source(docs).collect()}
    exact = {
        r.source: r.n
        for r in docs.groupBy("source")
        .agg(F.countDistinct("fingerprint").alias("n"))
        .collect()
    }
    assert set(per_source) == set(exact)
    for s, est in per_source.items():
        assert abs(est - exact[s]) / max(exact[s], 1) < 0.05


def test_cms_merge_equals_whole_and_overestimates(spark, sf_dir):
    """Count-min sketch contracts: (1) union of per-day partial
    sketches summed by (i, bucket) == the one-pass sketch (the
    incremental-rollup algebra); (2) estimates never undercount."""
    from udacitycapstonedataengineer_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    ev = load_table(spark, sf_dir, "events")
    whole = cms_build(ev.select("user_id"), "user_id")
    daily_partials = [
        cms_build(
            ev.filter(F.dayofmonth("ts") == d).select("user_id"), "user_id"
        )
        for d in (r.d for r in ev.select(
            F.dayofmonth("ts").alias("d")).distinct().collect())
    ]
    merged = daily_partials[0]
    for p in daily_partials[1:]:
        merged = merged.unionByName(p)
    merged = merged.groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))
    a = {(r.i, r.bucket): r.cnt for r in whole.collect()}
    b = {(r.i, r.bucket): r.cnt for r in merged.collect()}
    assert a == b

    probe = ev.select("user_id").distinct().limit(50)
    est = {r.user_id: r.est for r in
           cms_estimate(whole, probe, "user_id").collect()}
    exact = {r.user_id: r.n for r in
             ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    assert len(est) > 0
    for uid, e in est.items():
        assert e >= exact[uid], (uid, e, exact[uid])


def test_bloom_no_false_negatives_with_duplicate_probe_keys(spark):
    """ADVICE r4: a key probed twice must still be claimed present —
    presence is a universal min-check over distinct probe keys, not a
    position count (which double-counted duplicate rows)."""
    from udacitycapstonedataengineer_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
    )

    members = spark.range(0, 50).selectExpr("CAST(id AS BIGINT) AS k")
    bits = bloom_build(members, "k", m_bits=1024, depth=3)
    # probe every member THREE times plus some certain non-members
    probe = members.unionAll(members).unionAll(members).unionAll(
        spark.range(100000, 100020).selectExpr("CAST(id AS BIGINT) AS k")
    )
    got = {
        r.k: r.claimed_present
        for r in bloom_contains(bits, probe, "k", m_bits=1024, depth=3).collect()
    }
    assert len(got) == 70  # one row per DISTINCT probe key
    assert all(got[k] for k in range(50)), "false negative on duplicate probe"


def test_gram_matrix_int8_matches_numpy(spark, sf_dir):
    """Distributed integer Gram == driver-side numpy recomputation
    from the same quantized codes, and PCA-readiness: the matrix is
    symmetric-complete (full upper triangle incl. diagonal)."""
    import numpy as np

    from udacitycapstonedataengineer_spark.operators.similarity import (
        gram_matrix_int8,
        quantize_int8,
    )
    from udacitycapstonedataengineer_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["i"], r["j"]): r["gram"]
        for r in gram_matrix_int8(emb).collect()
    }
    M = np.array(
        [
            [int(x) for x in r["q_csv"].split(",")]
            for r in quantize_int8(emb).collect()
        ],
        dtype=np.int64,
    )
    G = M.T @ M
    d = G.shape[0]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert v == G[i - 1, j - 1]
    # diagonal sanity: sum of per-vector qnorm_sq equals trace
    trace = sum(got[(k, k)] for k in range(1, d + 1))
    assert trace == int(np.trace(G))
