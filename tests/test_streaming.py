"""Structured Streaming ingest + incremental batch MERGE semantics."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kgspark import fixtures, streaming


def test_stream_mention_counts(tmp_path, spark):
    pages_dir = str(tmp_path / "pages")
    fixtures.gen_pages(spark, 120).write.parquet(pages_dir)
    stream = streaming.stream_pages(spark, pages_dir)
    assert stream.isStreaming
    counts = streaming.stream_mention_counts(stream, ["Canada", "Ottawa"], window="24 hours")
    q = streaming.run_stream_to_memory(spark, counts, name="t_mentions")
    try:
        q.processAllAvailable()
        got = spark.sql("select * from t_mentions").collect()
    finally:
        q.stop()
    terms = {r["term"] for r in got}
    assert "canada" in terms
    # batch equivalence: streaming total == batch count of the same term
    batch_total = (
        fixtures.gen_pages(spark, 120)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .where(F.col("t") == "canada")
        .count()
    )
    stream_total = sum(r["n_mentions"] for r in got if r["term"] == "canada")
    assert stream_total == batch_total


def test_incremental_ingest_idempotent(tmp_path, spark):
    store = str(tmp_path / "triples")
    aliases = fixtures.gen_alias_index(spark)
    pages = fixtures.gen_pages(spark, 80).cache()
    first = streaming.incremental_ingest(spark, pages, aliases, store)
    n1 = first.count()
    # re-ingesting the same pages must not duplicate triples (keyed upsert)
    second = streaming.incremental_ingest(spark, pages, aliases, store)
    assert second.count() == n1
    # ingesting more pages only adds
    more = fixtures.gen_pages(spark, 160)
    third = streaming.incremental_ingest(spark, more, aliases, store)
    assert third.count() > n1


def test_incremental_ingest_partition_scoped(tmp_path, spark):
    """An increment that only carries some predicates must leave the other
    pred partitions' files byte-identical (partition-scoped MERGE, not a
    full-store rewrite)."""
    import hashlib
    from pathlib import Path

    store = str(tmp_path / "triples")
    aliases = fixtures.gen_alias_index(spark)
    pages = fixtures.gen_pages(spark, 80)
    first = streaming.incremental_ingest(spark, pages, aliases, store)
    n_first = first.count()  # count BEFORE later merges rewrite the files
    preds = {r["pred"] for r in first.select("pred").distinct().collect()}
    assert len(preds) > 1  # pred-partitioned store with several partitions

    def files_digest(pred):
        d = Path(store) / f"pred={pred}"
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in sorted(d.glob("*.parquet"))
        }

    before = {p: files_digest(p) for p in preds}

    # empty increment: touches nothing at all
    streaming.merge_triples(
        spark, first.limit(0).localCheckpoint(), store
    )
    assert {p: files_digest(p) for p in preds} == before

    # single-pred increment: only that partition's files may change
    pick = sorted(preds)[0]
    one = spark.createDataFrame(
        [("X_new", pick, "Y_new", "http://example.test/new")],
        "subj string, pred string, obj string, src_url string",
    )
    merged = streaming.merge_triples(spark, one, store)
    n_merged = merged.count()  # before the idempotency re-merge rewrites files
    assert n_merged == n_first + 1
    after = {p: files_digest(p) for p in preds}
    for p in preds - {pick}:
        assert after[p] == before[p], f"untouched partition {p} was rewritten"
    assert after[pick] != before[pick]

    # idempotent: merging the same row again changes nothing anywhere
    again = streaming.merge_triples(spark, one, store)
    assert again.count() == n_merged
