"""Spark-4 engine surfaces: VariantType is oracled via
``variant_extract_props``; here the Python UDTF surface and runtime
Bloom-filter join pruning are pinned.

The UDTF stays OUT of the relational query registry on purpose —
sentence splitting is demonstrated through the lateral-join surface,
but anything expressible natively ships natively
(test_plan_shape.py enforces that registry queries stay Python-free).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="sent_id: int, sentence: string")
class SplitSentences:
    """Sentence-splitting table function: one output row per sentence,
    order-stable ids — the lateral-expansion shape (text → rows) that
    has no single-expression native form when the splitter gets
    stateful (abbreviation handling, quoted speech, etc.)."""

    def eval(self, text: str):
        for i, s in enumerate(re.split(r"(?<=[.!?])\s+", (text or "").strip())):
            if s:
                yield i, s


def test_udtf_lateral_join(spark):
    spark.udtf.register("split_sentences", SplitSentences)
    rows = spark.sql(
        """
        SELECT t.doc_id, s.sent_id, s.sentence
        FROM VALUES (1, 'Hello world. How are you? Fine!'),
                    (2, 'One sentence only'),
                    (3, NULL) AS t(doc_id, text),
        LATERAL split_sentences(t.text) s
        ORDER BY doc_id, sent_id
        """
    ).collect()
    got = [(r.doc_id, r.sent_id, r.sentence) for r in rows]
    assert got == [
        (1, 0, "Hello world."),
        (1, 1, "How are you?"),
        (1, 2, "Fine!"),
        (2, 0, "One sentence only"),
    ]


def test_runtime_bloom_filter_prunes_shuffle_join(spark, tmp_path):
    """A selective filter on the small side of a shuffle join must
    inject a Bloom filter that semi-prunes the big side (the
    non-broadcastable fact⋈filtered-dim pattern at 100 TB)."""
    from udacitycapstonedataengineer_spark.session import enable_runtime_bloom

    spark.range(0, 500_000).withColumnRenamed("id", "k").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "big"))
    spark.range(0, 100_000).withColumnRenamed("id", "k2").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "small"))

    enable_runtime_bloom(spark, application_side_scan_threshold="0")
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = spark.read.parquet(str(tmp_path / "big"))
        small = spark.read.parquet(str(tmp_path / "small")).filter("k2 % 97 = 0")
        j = big.join(small, big.k == small.k2)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower()
        assert j.count() == 100_000 // 97 + 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "10GB",
        )


def test_parameterized_sql_named_args(spark, sf_dir):
    """spark.sql named-parameter binding (Spark 3.4+/4): values are
    bound as literals by the parser, not string-spliced — the
    injection-safe way to template thresholds into SQL."""
    from udacitycapstonedataengineer_spark.sources.readers import load_tables

    load_tables(spark, sf_dir)
    df = spark.sql(
        "SELECT count(*) AS n FROM orders "
        "WHERE o_totalprice > :min_price AND o_orderstatus = :status",
        args={"min_price": 1000.0, "status": "F"},
    )
    n = df.collect()[0].n
    expected = (
        load_tables(spark, sf_dir)["orders"]
        .filter("o_totalprice > 1000.0 AND o_orderstatus = 'F'")
        .count()
    )
    assert n == expected > 0


def test_sql_scripting_control_flow(spark, sf_dir):
    """Spark-4 SQL scripting (BEGIN/DECLARE/WHILE/SET): a scripted
    two-step maintenance procedure — derive a threshold into a
    variable, then aggregate against it — must equal the equivalent
    DataFrame two-step. The surface operations teams use to ship
    procedural maintenance jobs as pure SQL."""
    from pyspark.sql import functions as F

    from udacitycapstonedataengineer_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_v")
    got = {
        (r.o_orderstatus, r.n_above)
        for r in spark.sql(
            """
            BEGIN
              DECLARE avg_price DOUBLE;
              SET avg_price = (SELECT avg(o_totalprice) FROM orders_v);
              SELECT o_orderstatus, count(*) AS n_above
              FROM orders_v
              WHERE o_totalprice > avg_price
              GROUP BY o_orderstatus;
            END
            """
        ).collect()
    }
    avg_price = orders.agg(F.avg("o_totalprice")).collect()[0][0]
    want = {
        (r.o_orderstatus, r.n_above)
        for r in orders.filter(F.col("o_totalprice") > avg_price)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above"))
        .collect()
    }
    assert got == want and got
    # scripted loop: accumulate over a variable (pure control flow)
    row = spark.sql(
        """
        BEGIN
          DECLARE total INT DEFAULT 0;
          DECLARE i INT DEFAULT 1;
          WHILE i <= 5 DO
            SET total = total + i;
            SET i = i + 1;
          END WHILE;
          SELECT total AS sum_1_to_5;
        END
        """
    ).collect()[0]
    assert row.sum_1_to_5 == 15


def test_cbo_statistics_feed_the_optimizer(spark, sf_dir, tmp_path):
    """ANALYZE TABLE → catalog statistics → cost-based optimizer.
    Row counts and column NDVs must land in the catalog and surface in
    the optimized plan's stats — the input CBO join reordering and
    broadcast sizing read from on a real warehouse (file-size
    estimates alone misprice compressed/filtered tables)."""
    from udacitycapstonedataengineer_spark.sources.readers import load_table

    name = "t_cbo_orders"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        load_table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .option("path", str(tmp_path / "cbo_orders"))
        .saveAsTable(name)
    )
    spark.sql(
        f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS "
        "o_orderkey, o_custkey, o_orderstatus"
    )
    try:
        # table-level rowCount reaches the catalog…
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }
        assert "Statistics" in desc, sorted(desc)
        # …and column NDV reaches DESCRIBE output
        col = spark.sql(
            f"DESCRIBE EXTENDED {name} o_orderstatus"
        ).collect()
        info = {r["info_name"]: r["info_value"] for r in col}
        assert int(info["distinct_count"]) >= 3, info
        # the optimizer's plan stats carry the analyzed row count
        # (not a byte-size guess) once CBO is on
        prev = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            stats = (
                spark.table(name)
                ._jdf.queryExecution()
                .optimizedPlan()
                .stats()
            )
            assert stats.rowCount().isDefined()
            n = load_table(spark, sf_dir, "orders").count()
            assert int(str(stats.rowCount().get())) == n
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
