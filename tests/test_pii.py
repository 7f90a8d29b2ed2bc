"""PII detection/redaction (functions/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_spark.functions import pii


def _scrub(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(
        pii.scrub_pii(F.col("t")).alias("s"),
        pii.email_count(F.col("t")).alias("e"),
        pii.phone_count(F.col("t")).alias("p"),
        pii.ipv4_count(F.col("t")).alias("i"),
    ).collect()[0]


def test_redacts_all_three_types(spark):
    r = _scrub(
        spark,
        "mail a.b+c@test.org, call 555-123-4567, host 192.168.0.1 done",
    )
    assert r.s == "mail <EMAIL>, call <PHONE>, host <IP> done"
    assert (r.e, r.p, r.i) == (1, 1, 1)


def test_counts_multiple_and_none(spark):
    r = _scrub(spark, "x@y.io and z@w.co but no numbers")
    assert (r.e, r.p, r.i) == (2, 0, 0)
    clean = _scrub(spark, "plain text only")
    assert (clean.e, clean.p, clean.i) == (0, 0, 0)
    assert clean.s == "plain text only"


def test_phone_word_boundary(spark):
    # digits embedded in a longer number must not half-match
    r = _scrub(spark, "id 1555-123-45678 is not a phone")
    assert r.p == 0 and "<PHONE>" not in r.s
