"""PageRank: pinned hand-computed values, conservation on a cycle,
parallelism-invariance of the exact fixed-point mode, and double-mode
agreement."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark.ops import graph


def _star(spark):
    """Undirected star: c -- l1, l2, l3 (edges in both directions)."""
    und = [("c", f"l{i}") for i in (1, 2, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src string, dst string"
    )
    nodes = spark.createDataFrame([("c",), ("l1",), ("l2",), ("l3",)], "node string")
    return nodes, edges


def test_pagerank_star_pinned(spark):
    nodes, edges = _star(spark)
    r = {
        row["node"]: row["rank_e12"]
        for row in graph.pagerank(nodes, edges, n_iter=2).collect()
    }
    # hand-computed: S=1e12, base=0.15e12, shares via integral division
    # iter1: c = base + 3*(S*85//100) ; l = base + (S*85//100)//3
    # iter2 from those:
    assert r["c"] == 1_254_999_999_999
    assert r["l1"] == r["l2"] == r["l3"] == 915_000_000_000


def test_pagerank_cycle_conserves_scale(spark):
    """On a directed cycle every node has deg 1, so rank stays exactly
    SCALE each iteration (base + 85% of a full share): a closed-form
    invariant that catches any mass-accounting bug."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    out = graph.pagerank(nodes, edges, n_iter=4).collect()
    assert all(row["rank_e12"] == graph.SCALE for row in out)


def test_pagerank_e12_parallelism_invariant(spark):
    """The exact-arithmetic contract: 1-partition and 32-partition runs
    produce the identical rank vector (BIGINT sums are order-free)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    m = (
        docs.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .where(F.length("t") >= 5)
        .distinct()
    )
    edges = (
        m.select("doc_id", F.col("t").alias("src"))
        .join(m.select("doc_id", F.col("t").alias("dst")), "doc_id")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    nodes = m.select(F.col("t").alias("node")).distinct()
    lo = {
        r["node"]: r["rank_e12"]
        for r in graph.pagerank(
            nodes.repartition(1), edges.repartition(1), n_iter=3
        ).collect()
    }
    hi = {
        r["node"]: r["rank_e12"]
        for r in graph.pagerank(
            nodes.repartition(32), edges.repartition(32), n_iter=3
        ).collect()
    }
    assert lo == hi and len(lo) >= 10


def test_pagerank_double_mode_tracks_e12(spark):
    nodes, edges = _star(spark)
    exact = {
        r["node"]: r["rank_e12"] / graph.SCALE
        for r in graph.pagerank(nodes, edges, n_iter=3).collect()
    }
    dbl = {
        r["node"]: r["rank"] / graph.SCALE
        for r in graph.pagerank(nodes, edges, n_iter=3, mode="double").collect()
    }
    for k in exact:
        assert abs(exact[k] - dbl[k]) < 1e-6
