"""stage_counts / cardinality_counters / lineage_rows (A6/A8) + session
conf hygiene of the flagship query."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import metrics


def test_stage_counts_total_and_breakdown(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v int"
    )
    rows = {r["metric"]: r["value"] for r in metrics.stage_counts(df, "s1", by="k").collect()}
    assert rows["rows_total"] == 3
    assert rows["rows_k=a"] == 2
    assert rows["rows_k=b"] == 1
    assert all(r["stage"] == "s1" for r in metrics.stage_counts(df, "s1", by="k").collect())
    only_total = metrics.stage_counts(df, "s2").collect()
    assert len(only_total) == 1 and only_total[0]["value"] == 3


def test_cardinality_counters_hll(spark):
    df = spark.createDataFrame(
        [(i % 10, i % 3) for i in range(1000)], "a int, b int"
    )
    rows = {r["metric"]: r["value"] for r in
            metrics.cardinality_counters(df, "s", ["a", "b"]).collect()}
    # approx_count_distinct default rsd=5%; tiny cardinalities are exact
    assert rows["approx_distinct_a"] == 10
    assert rows["approx_distinct_b"] == 3


def test_lineage_rows_cover_all_partitions(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(100)], "k int"
    ).repartition(4)
    rows = metrics.lineage_rows(df, "stage_x", "k").collect()
    assert sum(r["n_rows"] for r in rows) == 100
    assert all(r["stage"] == "stage_x" for r in rows)
    assert len({r["partition_id"] for r in rows}) == len(rows)
    lo = min(int(r["key_min"]) for r in rows)
    hi = max(int(r["key_max"]) for r in rows)
    assert lo == 0 and hi == 99


def test_flagship_restores_session_conf(spark):
    from kgspark.entry_queries import kg_pipeline_triples

    key = "spark.sql.codegen.wholeStage"
    prior = spark.conf.get(key, None)
    df = kg_pipeline_triples(spark, "/root/testdata/sf0.001")
    assert df.count() > 0
    assert spark.conf.get(key, None) == prior
