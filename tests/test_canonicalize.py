"""Connected components, LSH blocking recall, consensus gates.

Covers the reference's hard cases (SURVEY.md §5.3): chains, cycles, the
Berlin->Kitchener change-preservation gate, OCR-variant merging, and
head-entity skew (one node connected to many).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kgspark import canonicalize as canon


def _cc(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node string")
    edf = spark.createDataFrame(edges, "a string, b string")
    out = canon.connected_components(ndf, edf)
    return {r["node"]: r["component"] for r in out.collect()}


def test_cc_chain(spark):
    comp = _cc(spark, list("abcdef"), [("a", "b"), ("b", "c"), ("d", "e")])
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["d"] == comp["e"] == "d"
    assert comp["f"] == "f"


def test_cc_cycle_terminates(spark):
    comp = _cc(spark, list("abc"), [("a", "b"), ("b", "c"), ("c", "a")])
    assert comp["a"] == comp["b"] == comp["c"] == "a"


def test_cc_long_chain_converges(spark):
    nodes = [f"n{i:02d}" for i in range(12)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(11)]
    comp = _cc(spark, nodes, edges)
    assert set(comp.values()) == {"n00"}


def test_cc_very_long_chain_pointer_doubling(spark):
    """60-node path: plain min-propagation needs 60 rounds (> max_iter=25);
    pointer doubling must converge within the budget or raise — never
    silently mislabel."""
    nodes = [f"n{i:02d}" for i in range(60)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(59)]
    comp = _cc(spark, nodes, edges)
    assert set(comp.values()) == {"n00"}


def test_cc_two_chains_and_isolated(spark):
    nodes = [f"a{i}" for i in range(20)] + [f"b{i}" for i in range(20)] + ["solo"]
    edges = [(f"a{i}", f"a{i+1}") for i in range(19)] + [
        (f"b{i}", f"b{i+1}") for i in range(19)
    ]
    comp = _cc(spark, nodes, edges)
    assert comp["a19"] == "a0" and comp["b19"] == "b0" and comp["solo"] == "solo"


def test_cc_star_skew(spark):
    """Head-entity star: hub connected to 200 spokes — one component."""
    nodes = ["hub"] + [f"s{i}" for i in range(200)]
    edges = [("hub", f"s{i}") for i in range(200)]
    comp = _cc(spark, nodes, edges)
    assert len(set(comp.values())) == 1


def test_lsh_blocking_recall_on_ocr_variants(spark):
    """Every OCR pair must survive LSH blocking (blocking-recall test,
    SURVEY.md §5.3 — analog of the reference bbox-prefilter assumption)."""
    pairs = [
        ("macdonald", "macdonaid"),
        ("ottawa", "ottavva"),
        ("winnipeg", "winipeg"),
        ("toronto", "torooto"),
        ("wilfrid laurier", "wilfrid lavrier"),
    ]
    surfaces = spark.createDataFrame(
        [(s,) for p in pairs for s in p], "norm_surface string"
    )
    cands = canon.candidate_pairs_lsh(surfaces)
    got = {(r["a"], r["b"]) for r in cands.collect()}
    for x, y in pairs:
        a, b = min(x, y), max(x, y)
        assert (a, b) in got, f"blocking lost pair {(a, b)}"


def test_consensus_gate_preserves_true_renames(spark):
    """Berlin->Kitchener analog: dissimilar names in one component must NOT
    be renamed; OCR variants MUST be."""
    occ = spark.createDataFrame(
        [("berlin", 5), ("kitchener", 9), ("ottawa", 50), ("ottavva", 2)],
        "norm_surface string, n_occurrences int",
    )
    comps = spark.createDataFrame(
        [("berlin", "berlin"), ("kitchener", "berlin"),
         ("ottawa", "ottava_c"), ("ottavva", "ottava_c")],
        "node string, component string",
    )
    cmap = {r["norm_surface"]: r for r in canon.consensus_canonical(occ, comps).collect()}
    assert not cmap["berlin"]["should_apply"]
    assert cmap["berlin"]["reason"] == "name_change"
    assert cmap["ottavva"]["should_apply"]
    assert cmap["ottavva"]["canonical_surface"] == "ottawa"
    assert cmap["ottavva"]["reason"] == "ocr_variants"


def test_same_as_edges_via_entity(spark):
    surfaces = spark.createDataFrame(
        [("ottawa",), ("bytown",), ("zzz",)], "norm_surface string"
    )
    s2e = spark.createDataFrame(
        [("ottawa", "Q2"), ("bytown", "Q2")], "norm_surface string, entity_id string"
    )
    edges = canon.same_as_edges(surfaces, s2e)
    got = {(r["a"], r["b"]) for r in edges.collect()}
    assert ("bytown", "ottawa") in got
