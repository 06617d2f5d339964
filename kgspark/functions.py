"""Scalar function library (SURVEY.md §2.8) — all pure column expressions.

Mirrors the reference's scalar helpers as JVM-side expressions (no UDFs):
haversine (convert_1921_to_lod.py:26-39), accent folding + abbreviation
canonicalization (csd_name_crosswalk.py:65-77), id mangling
(build_neo4j_cidoc_crm.py:92), year->timespan (build_census_observations_
v2.py:379-386), point parsing (fetch_canadian_communities_wikidata.py:170-181).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0

# accent-fold translate table (covers the reference's French toponyms)
_ACCENTS_FROM = "àáâãäåçèéêëìíîïñòóôõöùúûüýÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
_ACCENTS_TO = "aaaaaaceeeeiiiinooooouuuuyAAAAAACEEEEIIIINOOOOOUUUUY"

ABBREVIATIONS = [
    (r"\bste?\.\s*", "saint "),   # St. / Ste.
    (r"\btwp\b\.?", "township"),
    (r"\bmt\b\.?", "mount"),
]


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, pure column arithmetic."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def coord_decay_score(distance_km: Column, scale_km: float = 100.0) -> Column:
    """Distance -> [0,1] decay score (reference's coordinate blend term)."""
    return 1.0 / (1.0 + distance_km / F.lit(scale_km))


def fold_accents(col: Column) -> Column:
    return F.translate(col, _ACCENTS_FROM, _ACCENTS_TO)


def canonicalize_name(col: Column) -> Column:
    """lower + accent-fold + abbreviation expansion + whitespace collapse
    (reference normalize_name chain as one expression)."""
    c = F.lower(fold_accents(col))
    for pat, repl in ABBREVIATIONS:
        c = F.regexp_replace(c, pat, repl)
    c = F.regexp_replace(c, r"[^0-9a-z' -]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def mangle_id(*cols: Column, prefix: str | None = None) -> Column:
    """Deterministic concat-id (reference 'CD_' + pr + '_' + name pattern);
    spaces -> underscores."""
    body = F.concat_ws("_", *cols)
    body = F.regexp_replace(body, r"\s+", "_")
    return F.concat(F.lit(prefix + "_"), body) if prefix else body


def stable_id(*cols: Column) -> Column:
    """Collision-resistant stable id for web-scale keys (sha2 of url etc.)."""
    return F.sha2(F.concat_ws("\x1f", *cols), 256)


def year_timespan(year: Column) -> tuple[Column, Column]:
    """year -> (Jan 1, Dec 31) dates (reference E52_Time-Span emission)."""
    return (
        F.make_date(year, F.lit(1), F.lit(1)),
        F.make_date(year, F.lit(12), F.lit(31)),
    )


def parse_point(col: Column) -> tuple[Column, Column]:
    """'Point(lon lat)' WKT-ish string -> (lon, lat) doubles
    (reference Wikidata coordinate parsing)."""
    lon = F.regexp_extract(col, r"Point\(([-0-9.]+)\s+[-0-9.]+\)", 1).try_cast("double")
    lat = F.regexp_extract(col, r"Point\([-0-9.]+\s+([-0-9.]+)\)", 1).try_cast("double")
    return lon, lat
