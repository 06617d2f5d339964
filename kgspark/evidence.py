"""Per-entity evidence merging: the applyInPandas group-map (UDAF) operator.

Reference A2 "dissolve" (/root/reference/scripts/build_cd_presences.py:51-60):
union all member geometries per group with shapely, fixing invalid ones —
a group-agg whose merge logic can't be expressed as built-in aggregates.
The webtext analog (SURVEY.md §2.4): merge each entity's mention evidence
into one summary row — top surface forms, context-region histogram, url
span — where the per-group logic (ranked histogram with tie rules) runs as
an Arrow-batched `applyInPandas` group map.

Skew note: a head entity ("Canada", 35% of pages) makes one group huge.
The pre-aggregation below (groupBy counts BEFORE the group map) bounds each
group's row count by its *distinct-surface x distinct-region* cardinality —
vocabulary-sized — so the pandas group map never sees corpus-sized groups.
That pre-reduce is the same trick as the salted counters (ops/skew.py):
shrink before you gather.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVIDENCE_SCHEMA = (
    "entity_id string, n_mentions bigint, "
    "top_surfaces array<string>, region_histogram map<string,bigint>, "
    "first_url string, last_url string"
)


def merge_entity_evidence(links: DataFrame, top_k_surfaces: int = 3) -> DataFrame:
    """links (url, surface, entity_id, ...) -> one evidence row per entity.

    n_pages is computed on a separate (entity_id, url)-grain pre-reduce:
    countDistinct is NOT sum-decomposable, so distinct-url counts taken per
    (entity, surface, region) and then summed would double-count a url that
    mentions the same entity under two surfaces or regions."""
    high = links.where(F.col("confidence") == "high")
    pre = (
        high.withColumn("region", F.coalesce(F.col("admin_region"), F.lit("unknown")))
        .groupBy("entity_id", "surface", "region")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("url").alias("first_url"),
            F.max("url").alias("last_url"),
        )
    )
    # exact distinct pages per entity: dedup on (entity_id, url) first, then
    # count — two map-side-combinable shuffles on the same key, no giant
    # per-group state even for head entities.
    pages = (
        high.select("entity_id", "url")
        .distinct()
        .groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        by_surface = (
            pdf.groupby("surface")["n"].sum().sort_values(ascending=False)
        )
        # deterministic tie-break: count desc, then surface asc
        ranked = sorted(by_surface.items(), key=lambda kv: (-kv[1], kv[0]))
        top = [s for s, _ in ranked[:top_k_surfaces]]
        hist = pdf.groupby("region")["n"].sum().to_dict()
        return pd.DataFrame(
            {
                "entity_id": [pdf["entity_id"].iloc[0]],
                "n_mentions": [int(pdf["n"].sum())],
                "top_surfaces": [top],
                "region_histogram": [{k: int(v) for k, v in hist.items()}],
                "first_url": [pdf["first_url"].min()],
                "last_url": [pdf["last_url"].max()],
            }
        )

    merged = pre.groupBy("entity_id").applyInPandas(merge_group, EVIDENCE_SCHEMA)
    return merged.join(pages, "entity_id").select(
        "entity_id",
        "n_mentions",
        "n_pages",
        "top_surfaces",
        "region_histogram",
        "first_url",
        "last_url",
    )
