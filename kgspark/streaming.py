"""Incremental ingest: Structured Streaming over a pages directory.

The reference is batch-only (SURVEY.md §2.11) but was grown incrementally
("add 1911/1921 later", /root/reference/NEO4J_DATABASE_COMPLETE.md:75-77).
Two incremental modes are provided:

1. **micro-batch streaming** (`stream_mention_counts`): `readStream` on a
   parquet pages directory -> per-URL dedup with watermark on `warc_ts` ->
   windowed mention counters. `foreachBatch` runs the *batch* pipeline on
   each micro-batch and MERGE-appends triples — canonicalization itself
   stays a periodic batch job (connected components is not streamable),
   exactly the hybrid the survey prescribes.
2. **incremental batch** (`incremental_ingest`): process only partitions
   newer than the stored high-watermark — the Iceberg-style `MERGE INTO`
   resume pattern without a long-running query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_text_udf


def stream_pages(spark: SparkSession, pages_dir: str, schema: str | None = None):
    """readStream over a pages parquet directory (new files = new pages)."""
    from .fixtures import PAGES_SCHEMA

    return (
        spark.readStream.schema(schema or PAGES_SCHEMA).parquet(pages_dir)
    )


def stream_mention_counts(
    pages_stream: DataFrame,
    gazetteer: list[str],
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window mention counters with late-data watermark.

    Per-URL dedup uses dropDuplicatesWithinWatermark: plain
    dropDuplicates(["url"]) never evicts its state (Spark only cleans
    streaming dedup state when the event-time column is part of the key),
    so per-URL state would grow without bound in a long-running query.
    The WithinWatermark variant evicts entries once they age past the
    watermark — bounded state, at-most-once per url within the window."""
    toks = (
        pages_stream.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
        .withColumn("text2", F.coalesce(F.col("text"), extract_text_udf(F.col("html"))))
        .select("warc_ts", F.explode(F.split(F.lower("text2"), r"\s+")).alias("term"))
        .where(F.col("term").isin([g.lower() for g in gazetteer]))
    )
    return toks.groupBy(F.window("warc_ts", window).alias("w"), "term").agg(
        F.count(F.lit(1)).alias("n_mentions")
    ).select(F.col("w.start").alias("window_start"), "term", "n_mentions")


def run_stream_to_memory(spark: SparkSession, counts: DataFrame, name: str = "mention_counts"):
    """Start the streaming query against an in-memory sink (complete mode);
    returns the StreamingQuery (caller awaits + stops)."""
    return (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )


SESSION_OUTPUT_SCHEMA = (
    "term string, session_start timestamp, session_end timestamp, n_mentions long"
)
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"


def stream_mention_sessions(
    pages_stream: DataFrame,
    gazetteer: list[str],
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-term mention
    SESSIONS — contiguous bursts of mentions separated by >= `gap` of
    event-time silence. Emits one row per CLOSED session.

    This is the operator Structured Streaming's built-ins can't express
    (session windows need data-dependent extents): per-term state is
    (start, last, n); new batches extend or roll the session, and an
    event-time timeout (watermark passing last+gap) closes it. State is
    bounded by the gazetteer vocabulary, and eviction is guaranteed by the
    timeout — no unbounded growth on a 10^12-page stream.

    Reference analog (what, not how): the reference's decade-grouped
    temporal chains (assign_canonical_names.py:96-158) computed in batch;
    here the same burst semantics run continuously."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _duration_to_us(gap)

    toks = (
        pages_stream.withWatermark("warc_ts", watermark)
        .withColumn("text2", F.coalesce(F.col("text"), extract_text_udf(F.col("html"))))
        .select("warc_ts", F.explode(F.split(F.lower("text2"), r"\s+")).alias("term"))
        .where(F.col("term").isin([g.lower() for g in gazetteer]))
    )

    def track(key, pdfs, state: GroupState):
        (term,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "term": [term],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_mentions": [n],
                }
            )
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            t = pdf["warc_ts"].astype("int64") // 1000  # ns -> us
            ts_us.extend(t.tolist())
        if not ts_us:
            return
        # Split THIS batch's timestamps on silence gaps >= gap_us: one
        # trigger can carry several bursts (the file source's first batch
        # backfills every pre-existing file), and merging them to a single
        # (min, max, count) would bridge the silence between them.
        ts_us.sort()
        runs: list[tuple[int, int, int]] = []  # (start, end, n) bursts
        s, e, n = ts_us[0], ts_us[0], 1
        for t in ts_us[1:]:
            if t > e + gap_us:
                runs.append((s, e, n))
                s, e, n = t, t, 1
            else:
                e, n = t, n + 1
        runs.append((s, e, n))
        closed = []
        if state.exists:
            # The stored session joins the batch's bursts as its OWN run;
            # sorting by start and coalescing adjacents then decides every
            # merge uniformly. (Merging state into runs[0] whenever
            # runs[0].start <= last+gap bridged the silence between a late
            # in-batch burst and a LATER-starting stored session — state
            # 90-95m, late burst 36m, gap 10m emitted one 36-95m session
            # instead of closing the burst separately; round-5 advice.)
            runs.append(state.get)
            runs.sort(key=lambda r: r[0])
            i = 0
            while i + 1 < len(runs):
                if runs[i + 1][0] <= runs[i][1] + gap_us:
                    a, b = runs[i], runs[i + 1]
                    runs[i : i + 2] = [
                        (a[0], max(a[1], b[1]), a[2] + b[2])
                    ]
                else:
                    i += 1
        # every burst but the trailing one is followed by >= gap of silence
        # within the batch itself — close them now; the trailing burst stays
        # open in state (the next batch or the timeout decides its fate)
        closed.extend(runs[:-1])
        state.update(runs[-1])
        # close when the event-time watermark passes last+gap
        _, last_us, _ = state.get
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "term": [term] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_mentions": [n for _, _, n in closed],
                }
            )

    return toks.groupBy("term").applyInPandasWithState(
        track,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )


def _duration_to_us(text: str) -> int:
    n, unit = text.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return int(n) * mult * 1_000_000


_TRIPLE_KEY = ["subj", "pred", "obj", "src_url"]


def incremental_ingest(
    spark: SparkSession,
    pages: DataFrame,
    alias_index: DataFrame,
    triple_store_dir: str,
    since_ts: str | None = None,
) -> DataFrame:
    """Incremental batch: run the pipeline on pages newer than since_ts and
    MERGE the result into the pred-partitioned triple store (idempotent
    keyed upsert — the semantics of the reference's MATCH..CREATE import,
    import_1911_to_neo4j.py:22-192, and of Iceberg MERGE INTO).

    Partition-scoped: only the `pred` partitions present in the new batch
    are read back and rewritten (dynamic partition overwrite); untouched
    partitions' files are not touched. The predicate vocabulary is tiny and
    fixed (the north-rule relation set), so an increment costs
    O(touched partitions + batch), not O(store) — the scale-safe fix for
    the full-store rewrite this function used to do."""
    from .pipeline import run_pipeline

    batch = pages if since_ts is None else pages.where(F.col("warc_ts") > F.lit(since_ts))
    # materialize: the merged plan below must not re-run the pipeline, and
    # the write below must not race a lazy scan of the dir being replaced
    new_triples = run_pipeline(spark, batch, alias_index)["triples"].localCheckpoint()
    return merge_triples(spark, new_triples, triple_store_dir)


def merge_triples(
    spark: SparkSession, new_triples: DataFrame, triple_store_dir: str
) -> DataFrame:
    """Partition-scoped keyed upsert of triples into the pred-partitioned
    store. Only the pred partitions present in `new_triples` are read back,
    deduped against, and dynamically overwritten."""

    def read_store() -> DataFrame:
        # drop any cached file listing for this path: the dynamic overwrite
        # below deletes files that a session-global FileStatusCache entry
        # may still reference
        spark.catalog.refreshByPath(triple_store_dir)
        return spark.read.parquet(triple_store_dir)

    try:
        existing_all = read_store()
        existing_all.schema  # force resolution: missing dir raises here
    except Exception:  # first ingest: no store yet
        new_triples.write.mode("overwrite").partitionBy("pred").parquet(triple_store_dir)
        return read_store()

    # bounded collect: distinct predicates (relation vocabulary, ~10s)
    touched = [r["pred"] for r in new_triples.select("pred").distinct().collect()]
    if not touched:
        return read_store()
    existing = existing_all.where(F.col("pred").isin(touched))
    merged = existing.unionByName(new_triples.where(F.col("pred").isin(touched)))

    key = "spark.sql.sources.partitionOverwriteMode"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        merged.dropDuplicates(_TRIPLE_KEY).localCheckpoint().write.mode(
            "overwrite"
        ).partitionBy("pred").parquet(triple_store_dir)
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    return read_store()
