"""Sampling + sequence packing ops, and the log-mode TF-IDF variant the
oracle can't check."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kgspark.ops import sampling, textstats


def test_stratified_sample_deterministic_and_exact_k(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src")
    )
    a = sampling.stratified_sample(docs, "src", k=5).collect()
    b = sampling.stratified_sample(docs, "src", k=5).collect()
    assert sorted(r["doc_id"] for r in a) == sorted(r["doc_id"] for r in b)
    per = {}
    for r in a:
        per.setdefault(r["src"], []).append(r["sample_rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per.values())
    # hash order, not id order: the sample is not just the first k ids
    assert sorted(r["doc_id"] for r in a if r["src"] == "0") != [0, 3, 6, 9, 12]


def test_stratified_sample_small_stratum_keeps_all(spark):
    docs = spark.range(3).select(
        F.col("id").alias("doc_id"), F.lit("only").alias("src")
    )
    assert sampling.stratified_sample(docs, "src", k=10).count() == 3


def test_pack_sequences_matches_naive_cumsum(spark):
    """The distributed prefix sum (block subtotals + broadcast prefixes)
    must equal the single-window cumsum exactly — including across block
    boundaries and with gaps in the id space."""
    import random

    rng = random.Random(7)
    ids = sorted(rng.sample(range(0, 400), 120))  # gappy ids across blocks
    rows = [(i, " ".join("w" for _ in range(rng.randint(1, 40)))) for i in ids]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in sampling.pack_sequences(docs, budget=64, block_size=32).collect()
    }
    off = 0
    for i, text in rows:
        n = len(text.split(" "))
        r = got[i]
        assert r["n_tokens"] == n
        assert r["offset"] == off
        assert r["seq_id"] == off // 64
        assert r["seq_offset"] == off % 64
        assert r["n_seqs_spanned"] == (off % 64 + n - 1) // 64 + 1
        off += n


def test_pack_sequences_no_global_single_partition_window(spark):
    """Scale contract: the only unpartitioned window runs over the BLOCK
    table, so the per-doc stages never sort the corpus on one task. The
    plan's full-corpus windows must all be partitioned by _blk."""
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    import re

    plan = (
        sampling.pack_sequences(docs, block_size=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly ONE single-partition exchange, and it feeds the block-level
    # cumsum directly off the block HashAggregate (corpus/block_size rows,
    # not the corpus)
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert re.search(
        r"Exchange SinglePartition[^\n]*\n\s*\+- HashAggregate\(keys=\[_blk", plan
    ), plan
    # the per-doc running sum is a window PARTITIONED by _blk
    assert re.search(r"windowspecdefinition\(_blk#\d+L, doc_id#\d+L ASC", plan), plan
    # block prefixes come back via broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan, plan


def test_tfidf_topk_log_mode(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana the the the"),
            (2, "banana cherry the and of"),
            (3, "cherry cherry cherry date the"),
        ],
        "doc_id long, text string",
    )
    out = textstats.tfidf_topk(docs, k=2, idf_mode="log").collect()
    rows = {}
    for r in out:
        rows.setdefault(r["doc_id"], []).append(r)
    top1 = {d: min(rs, key=lambda r: r["rank"]) for d, rs in rows.items()}
    # 'the' appears in every doc -> idf 0 -> never a top term
    assert top1[1]["term"] == "apple" and top1[1]["tf"] == 2
    assert top1[3]["term"] == "cherry" and top1[3]["df"] == 2
    assert abs(top1[1]["score"] - 2 * math.log(3 / 1)) < 1e-9
    assert all(len(rs) == 2 for rs in rows.values())


def test_tfidf_ratio_mode_integer_exact(spark):
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "y z")], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["term"]): r["score_e6"]
        for r in textstats.tfidf_topk(docs, k=3, idf_mode="ratio_e6").collect()
    }
    assert out[(1, "x")] == 2 * 1_000_000 * 2 // 1  # tf=2, N=2, df=1
    assert out[(1, "y")] == 1 * 1_000_000 * 2 // 2
