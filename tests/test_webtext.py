"""Webtext operators: Gopher-style repetition signals, URL
canonicalization, as-of join."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.ops import webtext as W


def test_repetition_stats_pinned(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b a b a b c"),      # 2g: 6 total / 3 distinct, top 'a b' x3
            (1, "x"),                   # shorter than any n-gram
            (2, "buy buy buy now now"),  # token run of 3
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in W.repetition_stats(docs).collect()}
    assert rows[0]["dup_2gram_frac_e6"] == 500000      # (6-3)/6
    assert rows[0]["top_2gram_frac_e6"] == 500000      # 3/6
    assert rows[1]["dup_2gram_frac_e6"] == 0
    assert rows[1]["top_2gram_frac_e6"] == 0
    assert rows[1]["max_token_run"] == 1
    assert rows[2]["dup_2gram_frac_e6"] == 250000      # dup 'buy buy' (2 of 4)
    assert rows[2]["top_2gram_frac_e6"] == 500000      # 2/4
    assert rows[2]["dup_3gram_frac_e6"] == 0
    assert rows[2]["top_3gram_frac_e6"] == 333333      # 1/3
    assert rows[2]["max_token_run"] == 3


def test_repetition_stats_is_map_only(spark):
    """The scale contract: no shuffle — every signal is a per-row
    higher-order-function expression (the explode->groupBy alternative
    shuffles the whole token stream)."""
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = W.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_url_canonicalize(spark):
    df = spark.createDataFrame(
        [
            (0, "HTTPS://WWW.Foo.Example.ORG:443/a/b/page?utm_source=x&id=7&fbclid=z"),
            (1, "https://foo.example.org/page?utm_source=x"),  # all params stripped
            (2, "https://example.org/"),
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in W.url_canonicalize(df).collect()}
    assert rows[0]["host"] == "www.foo.example.org"
    assert rows[0]["reg_domain"] == "example.org"
    assert rows[0]["path_depth"] == 3
    assert rows[0]["canonical_url"] == "https://www.foo.example.org/a/b/page?id=7"
    # '?' dropped entirely when every param is tracking noise
    assert rows[1]["canonical_url"] == "https://foo.example.org/page"
    assert rows[2]["path_depth"] == 0
    assert rows[2]["reg_domain"] == "example.org"


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 20.0), (3, 10, 25.0), (4, 99, 7.0)],
        "event_id long, user_id long, ts double",
    )
    right = spark.createDataFrame(
        [(10, 4.0, 100.0), (10, 20.0, 200.0), (77, 1.0, 300.0)],
        "user_id long, ts double, value double",
    )
    rows = {
        r["event_id"]: r
        for r in W.asof_join(left, right, by="user_id", ts_col="ts").collect()
    }
    assert rows[1]["asof_value"] == 100.0 and rows[1]["asof_ts"] == 4.0
    # tie: right row AT the left ts is eligible (<=, not <)
    assert rows[2]["asof_value"] == 200.0 and rows[2]["asof_ts"] == 20.0
    assert rows[3]["asof_value"] == 200.0
    # group with no preceding right row -> nulls, row preserved
    assert rows[4]["asof_value"] is None and rows[4]["asof_ts"] is None
    assert set(rows) == {1, 2, 3, 4}


def test_asof_join_single_shuffle_no_cartesian(spark):
    left = spark.createDataFrame([(1, 10, 5.0)], "event_id long, user_id long, ts double")
    right = spark.createDataFrame([(10, 4.0, 1.0)], "user_id long, ts double, value double")
    plan = (
        W.asof_join(left, right, by="user_id", ts_col="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan
    # one hash-partitioning exchange per union branch on the by key, none after
    assert plan.count("hashpartitioning(user_id") <= 2, plan
