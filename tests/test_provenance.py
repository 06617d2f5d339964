"""Provenance dimension: per-domain source/actor/rights fan-out + edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import fixtures, provenance
from kgspark.pipeline import run_pipeline


def _triples(spark):
    return spark.createDataFrame(
        [
            ("Q1", "born_in", "Q2", "https://histories.example.ca/page1"),
            ("Q1", "governed", "Q3", "https://histories.example.ca/page2"),
            ("Q4", "signed", "Q5", "http://archive.example.org/t"),
            ("Q4", "signed", "Q6", "not-a-url"),
        ],
        "subj string, pred string, obj string, src_url string",
    )


def test_provenance_entities_fanout(spark):
    ents = provenance.provenance_entities(_triples(spark)).collect()
    # 3 domains x 3 rows (source, publisher, rights)
    assert len(ents) == 9
    by_type = {}
    for r in ents:
        by_type.setdefault(r["entity_type"], set()).add(r["entity_id"])
    assert len(by_type["web_source"]) == 3
    assert len(by_type["publisher"]) == 3
    assert len(by_type["rights"]) == 3
    src = {r["canonical_name"]: r for r in ents if r["entity_type"] == "web_source"}
    assert src["histories.example.ca"]["n_mentions"] == 2
    assert "not-a-url" in src  # malformed urls degrade to themselves


def test_provenance_edges(spark):
    edges = provenance.provenance_edges(_triples(spark))
    by_pred = {
        r["pred"]: r["n"]
        for r in edges.groupBy("pred").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_pred["published_by"] == 3
    assert by_pred["has_rights"] == 3
    # documented_in: one per (subj, domain) — Q1 and Q4 each span domains
    doc = {(r["subj"], r["obj"]): r["weight"] for r in
           edges.where("pred = 'documented_in'").collect()}
    assert doc[("Q1", "SRC_histories.example.ca")] == 2
    assert doc[("Q4", "SRC_archive.example.org")] == 1
    assert doc[("Q4", "SRC_not-a-url")] == 1


def test_pipeline_emits_provenance(spark):
    out = run_pipeline(spark, fixtures.gen_pages(spark, 80), fixtures.gen_alias_index(spark))
    assert out["prov_entities"].count() > 0
    types = {r["entity_type"] for r in out["prov_entities"].select("entity_type").distinct().collect()}
    assert types == {"web_source", "publisher", "rights"}
    preds = {r["pred"] for r in out["prov_edges"].select("pred").distinct().collect()}
    assert preds == {"published_by", "has_rights", "documented_in"}
