"""Scalar function library + applyInPandas evidence merge."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kgspark import evidence, fixtures
from kgspark import functions as kf
from kgspark.pipeline import run_pipeline


def test_haversine(spark):
    # Ottawa -> Toronto ~ 351 km
    df = spark.createDataFrame([(45.42, -75.69, 43.65, -79.38)], "a double, b double, c double, d double")
    km = df.select(kf.haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")).collect()[0]["km"]
    assert math.isclose(km, 351, rel_tol=0.05)
    score = df.select(kf.coord_decay_score(F.lit(0.0)).alias("s")).collect()[0]["s"]
    assert score == 1.0


def test_canonicalize_name(spark):
    df = spark.createDataFrame(
        [("Ste. Thérèse",), ("St. John's  TWP",), ("MONTRÉAL",)], "s string"
    )
    got = [r[0] for r in df.select(kf.canonicalize_name(F.col("s"))).collect()]
    assert got[0] == "saint therese"
    assert got[1] == "saint john's township"
    assert got[2] == "montreal"


def test_mangle_and_stable_ids(spark):
    df = spark.createDataFrame([("Nova Scotia", "Halifax Co")], "pr string, cd string")
    row = df.select(
        kf.mangle_id(F.col("pr"), F.col("cd"), prefix="CD").alias("m"),
        kf.stable_id(F.col("pr"), F.col("cd")).alias("h"),
    ).collect()[0]
    assert row["m"] == "CD_Nova_Scotia_Halifax_Co"
    assert len(row["h"]) == 64


def test_year_timespan_and_point(spark):
    df = spark.createDataFrame([(1901, "Point(-75.69 45.42)")], "y int, p string")
    start, end = kf.year_timespan(F.col("y"))
    lon, lat = kf.parse_point(F.col("p"))
    row = df.select(start.alias("s"), end.alias("e"), lon.alias("lon"), lat.alias("lat")).collect()[0]
    assert str(row["s"]) == "1901-01-01" and str(row["e"]) == "1901-12-31"
    assert math.isclose(row["lon"], -75.69) and math.isclose(row["lat"], 45.42)


def test_evidence_n_pages_distinct_urls(spark):
    # countDistinct is not sum-decomposable: a url mentioning the same
    # entity under two surfaces (or regions) must count as ONE page.
    links = spark.createDataFrame(
        [
            ("u1", "Canada", "E1", "high", "on"),
            ("u1", "Dominion of Canada", "E1", "high", "qc"),
            ("u2", "Canada", "E1", "high", "on"),
            ("u3", "Canada", "E1", "low", "on"),  # low-confidence: excluded
        ],
        "url string, surface string, entity_id string, confidence string, admin_region string",
    )
    row = evidence.merge_entity_evidence(links).collect()[0]
    assert row["n_pages"] == 2
    assert row["n_mentions"] == 3


def test_evidence_merge(spark):
    out = run_pipeline(spark, fixtures.gen_pages(spark, 150), fixtures.gen_alias_index(spark))
    ev = evidence.merge_entity_evidence(out["links"])
    rows = {r["entity_id"]: r for r in ev.collect()}
    canada = rows["Q1"]
    assert canada["n_mentions"] > 0
    assert "Canada" in canada["top_surfaces"]
    assert sum(canada["region_histogram"].values()) == canada["n_mentions"]
    # consistency with the salted counter used by build_entities
    ent = {r["entity_id"]: r["n_mentions"] for r in out["entities"].collect()}
    for eid, r in rows.items():
        assert ent[eid] == r["n_mentions"], eid
    # deterministic across runs
    ev2 = {r["entity_id"]: tuple(r["top_surfaces"]) for r in
           evidence.merge_entity_evidence(out["links"]).collect()}
    assert ev2 == {k: tuple(v["top_surfaces"]) for k, v in rows.items()}
