"""Per-stage metrics and per-partition lineage rows.

The reference tracks counts in driver-side dicts and writes summary txt
files (/root/reference/scripts/link_csd_years_spatial_v2.py:358-380,
build_neo4j_cidoc_crm.py:368-381). Here counters are DataFrame-native:

- ``stage_metrics``: one row per (stage, metric) computed with a single
  groupBy over the stage output (reference A6/A8).
- ``lineage_rows``: one row per (stage, partition) with row counts and
  min/max of the partition key — the "per-partition lineage rows and
  counters" of the north rule. Uses ``spark_partition_id()`` so the rows
  are computed inside the same job that writes the stage (no second scan
  of the full data beyond a cheap aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_counts(df: DataFrame, stage: str, by: str | None = None) -> DataFrame:
    """(stage, metric, value) rows: total count plus per-``by`` breakdown."""
    total = df.groupBy().agg(F.count(F.lit(1)).alias("value")).select(
        F.lit(stage).alias("stage"), F.lit("rows_total").alias("metric"), "value"
    )
    if by is None:
        return total
    per = df.groupBy(by).count().select(
        F.lit(stage).alias("stage"),
        F.concat(F.lit(f"rows_{by}="), F.col(by)).alias("metric"),
        F.col("count").alias("value"),
    )
    return total.unionByName(per)


def cardinality_counters(df: DataFrame, stage: str, cols: list[str]) -> DataFrame:
    """(stage, metric, value) approximate-distinct counters — the idiomatic
    upgrade over exact countDistinct for page/entity cardinalities at 10^12
    rows (SURVEY.md §2.4): HyperLogLog++ sketches merge map-side, so a
    head-key column costs the same as a uniform one."""
    aggs = [F.approx_count_distinct(c).alias(c) for c in cols]
    row = df.groupBy().agg(*aggs)
    stacked = row.selectExpr(
        f"stack({len(cols)}, "
        + ", ".join(f"'{c}', {c}" for c in cols)
        + ") as (col, value)"
    )
    return stacked.select(
        F.lit(stage).alias("stage"),
        F.concat(F.lit("approx_distinct_"), F.col("col")).alias("metric"),
        F.col("value").cast("long").alias("value"),
    )


def lineage_rows(df: DataFrame, stage: str, key_col: str) -> DataFrame:
    """One lineage row per physical partition of the stage output."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(key_col).alias("key_min"),
            F.max(key_col).alias("key_max"),
        )
        .select(
            F.lit(stage).alias("stage"),
            F.col("_pid").alias("partition_id"),
            "n_rows",
            F.col("key_min").cast("string").alias("key_min"),
            F.col("key_max").cast("string").alias("key_max"),
            F.current_timestamp().alias("recorded_at"),
        )
    )
