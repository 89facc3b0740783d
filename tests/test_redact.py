"""PII redaction: pattern semantics + the oracle query's hit rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.functions.text import redact_pii


def test_redact_pii_patterns(spark):
    cases = [
        ("mail john.doe+spam@mail.example.co.uk now", "mail <EMAIL> now"),
        ("cc 4111 1111 1111 1111 ok", "cc <CARD> ok"),
        ("cc 4111-1111-1111-1111 ok", "cc <CARD> ok"),
        ("ssn 123-45-6789.", "ssn <SSN>."),
        ("call 555-123-4567 or (555) 987-6543", "call <PHONE> or <PHONE>"),
        ("call 555.123.4567 too", "call <PHONE> too"),
        ("host 10.0.0.255 down", "host <IP> down"),
        # order matters: the email eats the @-adjacent digits first
        ("x 123-45-6789@a.io y", "x <EMAIL> y"),
        ("clean text stays clean", "clean text stays clean"),
    ]
    df = spark.createDataFrame(cases, "text string, want string")
    out = df.select("want", redact_pii("text").alias("got")).collect()
    for r in out:
        assert r.got == r.want, (r.got, r.want)


def test_redact_query_actually_redacts(spark, sf_dir):
    """Guard against silently-matching degenerate oracles: every
    constructed contact row must contain all three tags."""
    from udacitycapstonedataengineer_spark.plans.queries import QUERIES

    out = QUERIES["pii_redact_contacts"](spark, sf_dir)
    n = out.count()
    hit = out.filter(
        F.col("redacted").contains("<EMAIL>")
        & F.col("redacted").contains("<PHONE>")
        & F.col("redacted").contains("<IP>")
    ).count()
    assert n > 0 and hit == n
