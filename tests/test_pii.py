"""PII detector/redactor unit behavior (operators/pii.py)."""

from __future__ import annotations

from hudi_rs_spark.operators.pii import pii_scrub


def test_counts_and_redaction(spark):
    rows = [
        (1, "reach me at a.b+c@ex-ample.org or 10.0.0.1"),
        (2, "call +44 555-1234 and +1 123-4567 twice"),
        (3, "no pii here"),
        (4, "two mails x@y.io z@w.co and ip 192.168.001.255"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r.asDict() for r in pii_scrub(df, "text", "id").collect()}
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (1, 1, 0)
    assert got[2]["n_phone"] == 2
    assert (got[3]["n_email"], got[3]["n_ipv4"], got[3]["n_phone"]) == (0, 0, 0)
    assert got[3]["redacted"] == "no pii here"
    assert (got[4]["n_email"], got[4]["n_ipv4"]) == (2, 1)
    assert got[1]["redacted"] == "reach me at <EMAIL> or <IPV4>"
    assert got[2]["redacted"] == "call <PHONE> and <PHONE> twice"
    assert got[4]["redacted"] == "two mails <EMAIL> <EMAIL> and ip <IPV4>"


def test_no_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "x@y.io")], ["id", "text"])
    plan = pii_scrub(df, "text", "id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_stats_edges(spark):
    from hudi_rs_spark.operators.text import repetition_stats

    rows = [
        (1, "a a a a"),          # fully repetitive
        (2, "w"),                # single word: no bigrams
        (3, "a b a b a b"),      # alternating: 2 distinct words, 2 distinct bigrams
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {r["id"]: r.asDict() for r in repetition_stats(df, "text", "id").collect()}
    assert got[1]["n_words"] == 4 and got[1]["n_distinct"] == 1
    assert got[1]["top_word_ratio"] == 1.0
    assert got[1]["dup_bigram_ratio"] == 1.0 - 1.0 / 3.0
    assert got[2]["n_words"] == 1 and got[2]["dup_bigram_ratio"] == 0.0
    assert got[3]["distinct_ratio"] == 2.0 / 6.0
    assert got[3]["dup_bigram_ratio"] == 1.0 - 2.0 / 5.0
