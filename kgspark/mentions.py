"""Mention detection: gazetteer + capitalized-span patterns, one UDF pass.

Reference analog: the reference detects "mentions" by reading structured ids
out of census tables and matching place names against a fetched Wikidata
vocabulary (/root/reference/scripts/convert_1921_to_lod.py:97-153). Here the
input is free text, so detection is (a) a gazetteer scan (alternation regex
over the broadcast alias vocabulary, longest-first) and (b) a
capitalized-span pattern that surfaces *unknown* candidate mentions —
including OCR-corrupted forms the gazetteer can't see — for downstream fuzzy
linking (link.py) and canonicalization (canonicalize.py).

One `mapInPandas`-style pass emits, per page: mention spans, pattern-matched
relation candidates (relations.py owns the pattern table), and the context
features (admin regions present) used by link scoring. One pass = the text is
decoded and scanned once (SURVEY.md §7.2 M4: "same vectorized UDF pass").

Scale: no shuffle here — annotation is map-only, Arrow-batched. The
gazetteer scan auto-switches strategy on vocabulary size: alternation regex
below AC_THRESHOLD aliases (C-speed for small vocabularies), Aho-Corasick
automaton above it (ac.py — O(text) per page at ANY vocabulary size, built
once per executor and cached). Both produce identical leftmost-longest
non-overlapping word-boundary matches (pinned by test).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# capitalized span: tokens are initials ("A."), Capitalized words (hyphens,
# apostrophes allowed), or bare numbers ("Treaty 7"); "of" may glue tokens
# ("Treaty of Paris"). A period NOT part of an initial ends the span, so
# spans never leak across sentence boundaries.
_TOKEN = r"(?:[A-Z]\.|[A-Z][A-Za-z'’-]*|\d+)"
SPAN_RE = rf"{_TOKEN}(?:\s(?:of\s)?{_TOKEN})*"
_SPAN_COMPILED = re.compile(SPAN_RE)

# sentence-initial words that are not mentions (fixture filler + common)
_STOP_SPANS = frozenset(
    {"The", "A", "An", "It", "In", "On", "Historians", "Local", "Settlers",
     "Home", "About", "Archive", "Notes", "Archive Society"}
)

_REL_PATTERNS = [
    ("born_in", rf"({SPAN_RE}) was born in ({SPAN_RE})\."),
    ("governed", rf"({SPAN_RE}) governed ({SPAN_RE})\."),
    ("signed", rf"({SPAN_RE}) signed ({SPAN_RE})\."),
    ("located_in", rf"({SPAN_RE}) is located in ({SPAN_RE})\."),
    ("participated_in", rf"({SPAN_RE}) participated in ({SPAN_RE})\."),
]

# All five patterns fused into ONE text pass: the verb phrase is lowercase,
# and SPAN_RE tokens are Capitalized/initials/digits (lowercase only via the
# "of" glue), so a span can never contain a verb phrase — per-pred scans and
# the single fused scan find the identical match set (pinned by test against
# _REL_PATTERNS). One pass instead of five halves the annotate hot loop.
_REL_PHRASE_TO_PRED = {
    "was born in": "born_in",
    "governed": "governed",
    "signed": "signed",
    "is located in": "located_in",
    "participated in": "participated_in",
}
_REL_COMBINED = re.compile(
    rf"({SPAN_RE}) ({'|'.join(_REL_PHRASE_TO_PRED)}) ({SPAN_RE})\."
)

ANNOTATION_SCHEMA = (
    "url string, mentions array<struct<surface:string,kind:string>>, "
    "relations array<struct<subj_surface:string,pred:string,obj_surface:string>>, "
    "ctx_regions array<string>"
)


# above this many aliases, the alternation regex's per-position alternative
# scan loses to the Aho-Corasick automaton's O(1) transition
AC_THRESHOLD = 2048


def _build_scanner(gazetteer: list[str], regions: list[str], use_ac: bool | None = None):
    """Compile the scan machinery once per executor process."""
    if use_ac is None:
        use_ac = len(set(gazetteer)) > AC_THRESHOLD
    if use_ac:
        from .ac import automaton

        ac = automaton(sorted(set(gazetteer)))

        def gaz_scan(text: str) -> set[str]:
            return {text[s:e] for s, e in ac.scan(text)}

    else:
        gaz_sorted = sorted(set(gazetteer), key=len, reverse=True)
        gaz_re = re.compile(
            r"\b(" + "|".join(re.escape(g) for g in gaz_sorted) + r")\b"
        )

        def gaz_scan(text: str) -> set[str]:
            return {m.group(1) for m in gaz_re.finditer(text)}

    # One lookahead alternation over all regions: ONE pass finds candidate
    # start positions without consuming text, then each region is tested at
    # that position — so overlapping regions ('York' inside 'York County')
    # are BOTH recorded, exactly like the per-region search() this replaces.
    # A plain consuming alternation has first-alternative-wins semantics and
    # eats the matched span, silently dropping co-occurring regions.
    region_list = sorted(set(regions), key=len, reverse=True)
    region_probe = (
        re.compile(r"\b(?=(" + "|".join(re.escape(r) for r in region_list) + r"))")
        if regions
        else None
    )

    def region_scan(text: str) -> list[str]:
        if region_probe is None:
            return []
        found: set[str] = set()
        for m in region_probe.finditer(text):
            pos = m.start()
            for r in region_list:
                if r not in found and text.startswith(r, pos):
                    e = pos + len(r)
                    # word boundary at the end (start boundary is the \b)
                    if e == len(text) or not (text[e].isalnum() or text[e] == "_"):
                        found.add(r)
            if len(found) == len(region_list):
                break
        return sorted(found)

    def scan_text(text: str):
        if not text:
            return [], [], []
        gaz_hits = gaz_scan(text)
        mentions = [{"surface": s, "kind": "gazetteer"} for s in sorted(gaz_hits)]
        relations = []
        rel_args = set()
        for m in _REL_COMBINED.finditer(text):
            s, o = m.group(1), m.group(3)
            relations.append(
                {
                    "subj_surface": s,
                    "pred": _REL_PHRASE_TO_PRED[m.group(2)],
                    "obj_surface": o,
                }
            )
            rel_args.update((s, o))
        # capitalized spans not already known: candidate mentions for fuzzy
        # linking (OCR-corrupted forms land here)
        for m in _SPAN_COMPILED.finditer(text):
            s = m.group(0)
            if s not in gaz_hits and s not in _STOP_SPANS and s not in rel_args:
                mentions.append({"surface": s, "kind": "span"})
        mentions.extend(
            {"surface": s, "kind": "relation_arg"} for s in sorted(rel_args - gaz_hits)
        )
        return mentions, relations, region_scan(text)

    return scan_text


def annotate_pages(pages: DataFrame, gazetteer: list[str], regions: list[str]) -> DataFrame:
    """pages(url, text, ...) -> (url, mentions, relations, ctx_regions)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scan = _build_scanner(gazetteer, regions)
        for b in batches:
            out = {"url": b["url"], "mentions": [], "relations": [], "ctx_regions": []}
            for t in b["text"]:
                m, r, c = scan(t)
                out["mentions"].append(m)
                out["relations"].append(r)
                out["ctx_regions"].append(c)
            yield pd.DataFrame(out)

    return pages.select("url", "text").mapInPandas(run, ANNOTATION_SCHEMA)


def explode_mentions(annotated: DataFrame) -> DataFrame:
    """-> (url, surface, kind) one row per mention occurrence."""
    return annotated.select(
        "url", "ctx_regions", F.explode("mentions").alias("m")
    ).select("url", "ctx_regions", F.col("m.surface").alias("surface"), F.col("m.kind").alias("kind"))


def explode_relations(annotated: DataFrame) -> DataFrame:
    """-> (url, subj_surface, pred, obj_surface) raw surface-level triples."""
    return annotated.select("url", F.explode("relations").alias("r")).select(
        "url",
        F.col("r.subj_surface").alias("subj_surface"),
        F.col("r.pred").alias("pred"),
        F.col("r.obj_surface").alias("obj_surface"),
    )
