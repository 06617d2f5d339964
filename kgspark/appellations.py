"""Appellation emission: canonical + variant surface forms as graph rows.

Reference G3 (/root/reference/scripts/build_e41_appellations.py:24-107):
per temporal chain, one canonical E41 appellation node plus per-year variant
appellations, wired with P1_is_identified_by edges. Here: per canonicalized
surface component (canonicalize.py), one canonical appellation plus the
variant surfaces, attached to the resolved entity with `has_appellation` /
`has_variant_appellation` edges. Ambiguous-confidence links are routed to a
separate table the way the reference writes `ambiguous_*.csv` files
(link_csd_years_spatial_v2.py:252-260).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_appellations(canonical_map: DataFrame, resolved_surfaces: DataFrame) -> DataFrame:
    """(entity_id, appellation, is_canonical, reason) rows.

    canonical_map: canonicalize.consensus_canonical output
    resolved_surfaces: canonicalize.resolve_unlinked_surfaces output
    """
    joined = canonical_map.join(resolved_surfaces, "norm_surface", "inner")
    canonical = (
        joined.where(F.col("should_apply"))
        .select(
            "entity_id",
            F.col("canonical_surface").alias("appellation"),
            F.lit(True).alias("is_canonical"),
            "reason",
        )
        .dropDuplicates(["entity_id", "appellation"])
    )
    variants = (
        joined.where(F.col("norm_surface") != F.col("canonical_surface"))
        .select(
            "entity_id",
            F.col("norm_surface").alias("appellation"),
            F.lit(False).alias("is_canonical"),
            "reason",
        )
        .dropDuplicates(["entity_id", "appellation"])
    )
    return canonical.unionByName(variants)


def appellation_edges(appellations: DataFrame) -> DataFrame:
    """(subj=entity, pred, obj=appellation literal id) edge rows — the
    P1_is_identified_by analog."""
    return appellations.select(
        F.col("entity_id").alias("subj"),
        F.when(F.col("is_canonical"), "has_appellation")
        .otherwise("has_variant_appellation")
        .alias("pred"),
        F.concat(F.lit("name:"), F.regexp_replace("appellation", r"\s+", "_")).alias("obj"),
        F.lit(None).cast("string").alias("src_url"),
    )


def ambiguous_links(links: DataFrame) -> DataFrame:
    """The reference's ambiguous-output routing: candidate links below the
    accept gates, kept for review instead of dropped."""
    return links.where(F.col("confidence") == "ambiguous").select(
        "url", "surface", "entity_id", "canonical_name", "name_sim", "ctx_score", "score"
    )
