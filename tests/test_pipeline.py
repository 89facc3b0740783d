"""End-to-end star pipeline: build → partitioned parquet sinks →
re-read → quality gates (the reference's etl.py lifecycle, S5/S6/Q1 +
FK coverage made real)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.operators.quality import (
    QualityError,
    assert_nonempty,
    check_star,
    fk_coverage,
)
from udacitycapstonedataengineer_spark.plans.star import build_star
from udacitycapstonedataengineer_spark.sources.readers import load_tables
from udacitycapstonedataengineer_spark.sources.writers import write_parquet


def test_star_pipeline_roundtrip(spark, sf_dir, tmp_path):
    star = build_star(load_tables(spark, sf_dir))
    metrics = check_star(star)
    assert metrics["unresolved_fks"] == 0
    assert all(metrics[t] > 0 for t in star)

    # partitioned sink (S6: reference partitions calendar by y/m/w)
    cal_path = str(tmp_path / "calendar_dim")
    write_parquet(
        star["calendar_dim"],
        cal_path,
        partition_by=["arrival_year", "arrival_month", "arrival_week"],
    )
    assert any(d.startswith("arrival_year=") for d in os.listdir(cal_path))

    fact_path = str(tmp_path / "fact")
    write_parquet(star["fact"], fact_path)

    # re-read: round-trip preserves rows and partition pruning works
    cal_back = spark.read.parquet(cal_path)
    assert cal_back.count() == star["calendar_dim"].count()
    one_year = cal_back.filter(F.col("arrival_year") == 1995)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert one_year.count() > 0
    # partition filter must prune at the source, not post-scan
    assert "PartitionFilters: [isnotnull(arrival_year" in plan

    fact_back = spark.read.parquet(fact_path)
    assert fact_back.count() == star["fact"].count()


def test_row_accounting(spark, sf_dir):
    from udacitycapstonedataengineer_spark.operators.cleaning import (
        drop_nulls,
        row_accounting,
    )

    ev = load_tables(spark, sf_dir, names=("events",))["events"]
    cleaned = drop_nulls(ev, subset=["user_id", "event_type"])
    m = row_accounting(ev, cleaned)
    assert m["rows_before"] == ev.count()
    assert m["rows_before"] - m["rows_dropped"] == m["rows_after"]
    assert m["rows_after"] == cleaned.count()


def test_quality_gates_raise(spark):
    empty = spark.range(0).select(F.col("id").alias("k"))
    full = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(QualityError):
        assert_nonempty({"t": empty})
    # FK 5 in fact, dim only has 0..4
    fact = spark.range(6).select(F.col("id").alias("k"))
    with pytest.raises(QualityError):
        fk_coverage(fact, full, "k", "k")
    assert fk_coverage(full, full, "k", "k") == {"unresolved_fks": 0}


def test_prepare_corpus_chain(spark, sf_dir):
    """The composed corpus pipeline: monotone row accounting, chunk
    counts consistent with kept docs, and run-to-run determinism."""
    from udacitycapstonedataengineer_spark.plans.corpus import prepare_corpus
    from udacitycapstonedataengineer_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks, m = prepare_corpus(docs)
    assert (
        m["raw"] >= m["after_quality"] >= m["after_lang"]
        >= m["after_exact_dedup"] >= m["after_near_dedup"]
    )
    assert m["after_near_dedup"] > 0
    assert m["chunks"] >= m["after_near_dedup"]  # ≥1 chunk per kept doc
    # kept docs are unique
    assert chunks.select("doc_id").distinct().count() == m["after_near_dedup"]
    # deterministic end to end
    chunks2, m2 = prepare_corpus(docs)
    assert m2 == m
    assert sorted(map(tuple, chunks.collect())) == sorted(
        map(tuple, chunks2.collect())
    )


def test_observed_clean_single_pass(spark):
    """Observation metrics must match the data and cost no extra job."""
    from udacitycapstonedataengineer_spark.operators.cleaning import observed_clean

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c"), (4, "d"), (None, None)],
        "k int, v string",
    )
    cleaned, obs = observed_clean(df, ["k", "v"])
    kept = cleaned.count()  # the ONE action; metrics ride along
    assert kept == 2
    m = obs.get
    assert m["rows_seen"] == 5
    assert m["rows_dropped"] == 3
    assert m["rows_seen"] - m["rows_dropped"] == kept


def test_expectation_split_quarantines_with_evidence(spark):
    """Failing rows land in quarantine with the names of the rules
    they broke; clean + quarantine partitions the input exactly."""
    from pyspark.sql import functions as F

    from udacitycapstonedataengineer_spark.operators.quality import (
        expect,
        expectation_split,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, -5.0, "A"), (3, 7.0, "X"), (4, None, "R")],
        "id long, price double, flag string",
    )
    rules = [
        expect("price_positive", F.col("price") > 0),
        expect("flag_domain", F.col("flag").isin("A", "N", "R")),
    ]
    clean, quarantine = expectation_split(df, rules)
    assert {r.id for r in clean.collect()} == {1}
    bad = {r.id: sorted(r.failed_rules) for r in quarantine.collect()}
    assert bad == {
        2: ["price_positive"],
        3: ["flag_domain"],
        4: ["price_positive"],  # null price = unevaluable = violation
    }
    assert clean.count() + quarantine.count() == df.count()
