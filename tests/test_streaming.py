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


def test_stream_mention_sessions_stateful(tmp_path, spark):
    """applyInPandasWithState sessionizer: two bursts of 'canada' mentions
    separated by > gap must come out as two closed sessions with the right
    extents and counts; the second closes via the event-time timeout when
    the watermark advances."""
    import datetime as dt

    pages_dir = str(tmp_path / "spages")

    def page(url, ts, text):
        return (url, ts, None, text, "en")

    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)

    def write(batch, rows):
        spark.createDataFrame(rows, fixtures.PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(pages_dir)

    # burst 1: 3 mentions within 10 minutes
    write(1, [
        page("u1", t0, "canada rises"),
        page("u2", t0 + dt.timedelta(minutes=5), "canada again"),
        page("u3", t0 + dt.timedelta(minutes=10), "canada indeed"),
    ])
    stream = streaming.stream_pages(spark, pages_dir)
    sessions = streaming.stream_mention_sessions(
        stream, ["Canada"], gap="30 minutes", watermark="10 minutes"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # burst 2: far later (gap exceeded) -> closes burst 1 in-batch or
        # via timeout once the watermark moves past last+gap
        write(2, [
            page("u4", t0 + dt.timedelta(hours=3), "canada returns"),
            page("u5", t0 + dt.timedelta(hours=3, minutes=2), "canada stays"),
        ])
        q.processAllAvailable()
        # flush batch: advances the watermark beyond burst-2's last+gap so
        # the event-time timeout fires and closes burst 2 (no 'canada' here)
        write(3, [page("u6", t0 + dt.timedelta(hours=9), "nothing relevant")])
        q.processAllAvailable()
        write(4, [page("u7", t0 + dt.timedelta(hours=10), "still nothing")])
        q.processAllAvailable()
        got = spark.sql("select * from t_sessions").collect()
    finally:
        q.stop()

    sessions_out = {
        (r["session_start"], r["session_end"]): r["n_mentions"] for r in got
    }
    assert sessions_out.get((t0, t0 + dt.timedelta(minutes=10))) == 3
    b2 = (t0 + dt.timedelta(hours=3), t0 + dt.timedelta(hours=3, minutes=2))
    assert sessions_out.get(b2) == 2
    assert len(sessions_out) == 2


def test_stream_sessions_split_within_one_batch(tmp_path, spark):
    """Two bursts separated by > gap arriving in the SAME microbatch (the
    file source's backfill batch reads every pre-existing file) must still
    come out as two sessions — the batch is split on internal silence gaps
    rather than collapsed to one (min, max, count) span (round-3 advice)."""
    import datetime as dt

    pages_dir = str(tmp_path / "spages2")
    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)
    rows = [
        ("u1", t0, None, "canada rises", "en"),
        ("u2", t0 + dt.timedelta(minutes=5), None, "canada again", "en"),
        # > 30 min silence inside the same file
        ("u3", t0 + dt.timedelta(hours=2), None, "canada returns", "en"),
        ("u4", t0 + dt.timedelta(hours=2, minutes=3), None, "canada stays", "en"),
        ("u5", t0 + dt.timedelta(hours=2, minutes=6), None, "canada remains", "en"),
    ]
    spark.createDataFrame(rows, fixtures.PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(pages_dir)

    stream = streaming.stream_pages(spark, pages_dir)
    sessions = streaming.stream_mention_sessions(
        stream, ["Canada"], gap="30 minutes", watermark="10 minutes"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions_onebatch")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark so the trailing open session times out
        for i, hours in enumerate((9, 10)):
            spark.createDataFrame(
                [(f"f{i}", t0 + dt.timedelta(hours=hours), None, "filler", "en")],
                fixtures.PAGES_SCHEMA,
            ).coalesce(1).write.mode("append").parquet(pages_dir)
            q.processAllAvailable()
        got = spark.sql("select * from t_sessions_onebatch").collect()
    finally:
        q.stop()

    out = {(r["session_start"], r["session_end"]): r["n_mentions"] for r in got}
    assert out.get((t0, t0 + dt.timedelta(minutes=5))) == 2
    b2 = (t0 + dt.timedelta(hours=2), t0 + dt.timedelta(hours=2, minutes=6))
    assert out.get(b2) == 3
    assert len(out) == 2


def test_stream_sessions_out_of_order_late_burst(tmp_path, spark):
    """Late events INSIDE the watermark that precede the stored session's
    end must not split it: with state (t0..84m) open and a late batch
    carrying mentions at 36m and 70.5m (gap=30m), the batch-local runs are
    (36m) and (70.5m); merging state into the first extends it to 84m,
    which now bridges the second — failing to re-coalesce would close a
    session ending at 84m while keeping an "open" run at 70.5m
    (overlapping output, state.last moving backwards). The whole thing
    must come out as ONE session t0..84m with all 6 mentions (round-4
    advice)."""
    import datetime as dt

    pages_dir = str(tmp_path / "spages3")
    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, fixtures.PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(pages_dir)

    # batch 1: one open session t0 .. t0+84m (every step <= 30m gap)
    write([
        ("u1", t0, None, "canada rises", "en"),
        ("u2", t0 + dt.timedelta(minutes=28), None, "canada again", "en"),
        ("u3", t0 + dt.timedelta(minutes=56), None, "canada indeed", "en"),
        ("u4", t0 + dt.timedelta(minutes=84), None, "canada still", "en"),
    ])
    stream = streaming.stream_pages(spark, pages_dir)
    sessions = streaming.stream_mention_sessions(
        stream, ["Canada"], gap="30 minutes", watermark="10 hours"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions_late")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: out-of-order events still inside the 10h watermark
        write([
            ("u5", t0 + dt.timedelta(minutes=36), None, "canada late", "en"),
            ("u6", t0 + dt.timedelta(minutes=70, seconds=30), None, "canada later", "en"),
        ])
        q.processAllAvailable()
        # advance the watermark past 84m+gap so the merged session times out
        for i, hours in enumerate((20, 21)):
            write([(f"f{i}", t0 + dt.timedelta(hours=hours), None, "filler", "en")])
            q.processAllAvailable()
        got = spark.sql("select * from t_sessions_late").collect()
    finally:
        q.stop()

    out = {(r["session_start"], r["session_end"]): r["n_mentions"] for r in got}
    assert out == {(t0, t0 + dt.timedelta(minutes=84)): 6}


def test_stream_sessions_late_burst_before_stored_session(tmp_path, spark):
    """Late bursts that end >= gap BEFORE the stored session STARTS must
    close as their own sessions, not merge into it: state (90m..95m) open,
    gap 10m, late batch carries bursts at 36m and 70m. Merging state into
    the first batch run whenever run.start <= state.last + gap bridged the
    36m->90m silence into one 36-95m session (round-5 advice); appending
    the state as its own run + sort + adjacent-coalesce closes 36m and 70m
    separately and keeps 90-95m open."""
    import datetime as dt

    pages_dir = str(tmp_path / "spages4")
    t0 = dt.datetime(2020, 1, 1, 0, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, fixtures.PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(pages_dir)

    # batch 1: stored session 90m..95m
    write([
        ("u1", t0 + dt.timedelta(minutes=90), None, "canada opens", "en"),
        ("u2", t0 + dt.timedelta(minutes=95), None, "canada holds", "en"),
    ])
    stream = streaming.stream_pages(spark, pages_dir)
    sessions = streaming.stream_mention_sessions(
        stream, ["Canada"], gap="10 minutes", watermark="10 hours"
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions_early_late")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: late bursts well BEFORE the stored session, separated
        # from each other and from 90m by > gap
        write([
            ("u3", t0 + dt.timedelta(minutes=36), None, "canada late", "en"),
            ("u4", t0 + dt.timedelta(minutes=70), None, "canada later", "en"),
        ])
        q.processAllAvailable()
        for i, hours in enumerate((20, 21)):  # watermark past 95m+gap
            write([(f"f{i}", t0 + dt.timedelta(hours=hours), None, "filler", "en")])
            q.processAllAvailable()
        got = spark.sql("select * from t_sessions_early_late").collect()
    finally:
        q.stop()

    out = {(r["session_start"], r["session_end"]): r["n_mentions"] for r in got}
    m = dt.timedelta
    assert out == {
        (t0 + m(minutes=36), t0 + m(minutes=36)): 1,
        (t0 + m(minutes=70), t0 + m(minutes=70)): 1,
        (t0 + m(minutes=90), t0 + m(minutes=95)): 2,
    }
