"""End-to-end KG construction pipeline: pages -> triples, resumable.

Composition of the stage modules (SURVEY.md §7.2 build order), each stage an
optional checkpoint via io.CheckpointRegistry so a killed run resumes from
the last completed stage (reference pattern: scripts re-load prior CSVs;
SURVEY.md §4 "Checkpoint/resume").

    extract -> annotate -> link -> canonicalize -> resolve -> materialize
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import canonicalize as canon
from . import link as linkmod
from . import materialize as mat
from . import metrics
from . import provenance as prov
from . import temporal
from .extract import with_extracted_text
from .io import CheckpointRegistry
from .mentions import annotate_pages, explode_mentions, explode_relations
from .relations import resolve_triples


def gazetteer_from_alias_index(alias_index: DataFrame) -> tuple[list[str], list[str]]:
    """Collect the (small, broadcastable) vocabulary to the driver once.
    This is the ONE permitted driver-side collect: the alias index is by
    definition broadcast-sized (north rule)."""
    rows = alias_index.select("aliases", "admin_region").collect()
    gaz = sorted({a for r in rows for a in r["aliases"]})
    regions = sorted({r["admin_region"] for r in rows if r["admin_region"]})
    return gaz, regions


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    alias_index: DataFrame,
    checkpoint_dir: str | None = None,
    extract_html: bool = True,
) -> dict[str, DataFrame]:
    """Run (or resume) the full pipeline; returns all stage DataFrames."""
    reg = CheckpointRegistry(spark, checkpoint_dir) if checkpoint_dir else None

    # Stages consumed by 2+ downstream stages: break recomputation with a
    # lazy localCheckpoint. Single-consumer stages stay fully lazy so
    # Catalyst fuses them into their consumer (fewer jobs — job-launch
    # latency is the serial floor of the pipeline at small scale).
    _SHARED = {"annotated", "links", "surfaces", "surface_entity", "components"}

    def ck(name: str, make, partition_by=None) -> DataFrame:
        if reg is None:
            df = make()
            return df.localCheckpoint(eager=False) if name in _SHARED else df
        return reg.stage(name, make, partition_by=partition_by)

    gaz, regions = gazetteer_from_alias_index(alias_index)

    extracted = ck(
        "extracted",
        lambda: (with_extracted_text(pages.drop("text")) if extract_html else pages),
    )
    if reg is None and extract_html:
        # no checkpoint boundary between extract and annotate: fuse the
        # frozen extractor into the annotation pass so the 13KB-per-page
        # text never crosses the JVM<->Python boundary twice (guide §4.1).
        # Byte-identical output: annotate_pages(from_html=True) applies the
        # same extract_text_bytes the `extracted` stage uses.
        annotated = ck(
            "annotated", lambda: annotate_pages(pages, gaz, regions, from_html=True)
        )
    else:
        annotated = ck("annotated", lambda: annotate_pages(extracted, gaz, regions))
    mentions = ck("mentions", lambda: explode_mentions(annotated))
    relations = ck("relations", lambda: explode_relations(annotated))
    links = ck("links", lambda: linkmod.link_mentions(mentions, alias_index))

    def make_canonical_inputs():
        return (
            mentions.withColumn("norm_surface", linkmod.normalize_surface(F.col("surface")))
            .groupBy("norm_surface")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
        )

    surfaces = ck("surfaces", make_canonical_inputs)
    s2e = ck("surface_entity", lambda: linkmod.surface_to_entity_map(links))

    def make_components():
        edges = canon.same_as_edges(surfaces, s2e)
        return canon.connected_components(
            surfaces.select(F.col("norm_surface").alias("node")), edges
        )

    components = ck("components", make_components)
    canonical_map = ck(
        "canonical_map", lambda: canon.consensus_canonical(surfaces, components)
    )
    resolved = ck(
        "resolved_surfaces", lambda: canon.resolve_unlinked_surfaces(components, s2e)
    )
    triples = ck(
        "triples", lambda: resolve_triples(relations, links, resolved), partition_by=["pred"]
    )

    # Derived dimensions are built LAZILY (first dict access): their
    # construction triggers eager Catalyst analysis (unionByName resolves
    # schemas immediately) over the full pipeline tree — measured ~5s of
    # driver time per run — which consumers that only want `triples`
    # should not pay. entities/edges/lineage live here too: they are
    # pure plan construction (Py4J + analysis, part of the serial driver
    # floor) that triples-only consumers — including the scaling bench —
    # never execute.
    lazy_builders = {
        "entities": lambda: ck("entities", lambda: mat.build_entities(alias_index, links)),
        "edges": lambda: ck(
            "edges",
            lambda: mat.build_edges(triples, mat.build_mention_edges(links)),
            partition_by=["pred"],
        ),
        "lineage": lambda: ck(
            "lineage",
            lambda: metrics.lineage_rows(stages["edges"], "edges", "subj").unionByName(
                metrics.lineage_rows(triples, "triples", "subj")
            ),
        ),
        "prov_entities": lambda: ck(
            "prov_entities", lambda: prov.provenance_entities(triples)
        ),
        "prov_edges": lambda: ck("prov_edges", lambda: prov.provenance_edges(triples)),
        "entity_snapshots": lambda: ck(
            "entity_snapshots", lambda: temporal.entity_snapshots(links, pages)
        ),
        # Built from the (checkpointed) entity_snapshots stage via the lazy
        # dict itself so accessing both keys runs the snapshot agg once.
        "entity_timeline": lambda: ck(
            "entity_timeline",
            lambda: temporal.entity_timeline(stages["entity_snapshots"]),
        ),
    }

    stages = _LazyStages(lazy_builders, {
        "extracted": extracted,
        "annotated": annotated,
        "mentions": mentions,
        "relations": relations,
        "links": links,
        "surfaces": surfaces,
        "surface_entity": s2e,
        "components": components,
        "canonical_map": canonical_map,
        "resolved_surfaces": resolved,
        "triples": triples,
    })
    return stages


class _LazyStages(dict):
    """Stage dict whose derived entries build on first access.

    The whole dict protocol sees the union of eager and lazy keys —
    get()/items()/values()/len()/iteration included — but only
    __getitem__/get/items/values actually trigger a build."""

    def __init__(self, builders, eager):
        super().__init__(eager)
        self._builders = builders

    def _pending(self):
        # dict.__contains__ explicitly: zero-arg super() has no __class__
        # cell inside a comprehension scope
        return [k for k in self._builders if not dict.__contains__(self, k)]

    def __getitem__(self, key):
        if not super().__contains__(key) and key in self._builders:
            self[key] = self._builders[key]()
        return super().__getitem__(key)

    def __contains__(self, key):
        return super().__contains__(key) or key in self._builders

    def get(self, key, default=None):  # noqa: A003 - dict interface
        return self[key] if key in self else default

    def keys(self):  # noqa: A003 - dict interface
        return list(dict.keys(self)) + self._pending()

    def __iter__(self):
        return iter(self.keys())

    def __len__(self):
        return dict.__len__(self) + len(self._pending())

    def items(self):  # noqa: A003 - dict interface
        return [(k, self[k]) for k in self.keys()]

    def values(self):  # noqa: A003 - dict interface
        return [self[k] for k in self.keys()]
