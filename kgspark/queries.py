"""Query-parity suite: the reference's 11 Cypher test queries re-expressed
as Spark SQL / DataFrame plans over the materialized `entities`/`edges`
tables.

Reference tests: /root/reference/test_queries.sh:4-99 (6 spatial/graph) and
/root/reference/test_census_queries.sh:4-78 (5 census). Each Cypher hop is
one equi-join on (subj|obj, pred); `pred`-partitioned edges give partition
pruning per hop (the reference pre-created 14 Neo4j indexes instead,
create_indexes.cypher:9-40).

Queries are parameterized over the webtext graft's graph: entity lookup,
multi-hop traversal, aggregate rollups, temporal-ish slices, top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _edges(edges: DataFrame, pred: str) -> DataFrame:
    return edges.where(F.col("pred") == pred)


def q1_entity_lookup(entities: DataFrame, name: str) -> DataFrame:
    """TEST 1 analog (place lookup by name, <0.1s class)."""
    return entities.where(F.col("canonical_name") == name)


def q2_entity_timeline(edges: DataFrame, entity_id: str) -> DataFrame:
    """TEST 2 analog (Ottawa timeline): all facts about one entity, ordered
    by provenance url."""
    e = edges.where((F.col("subj") == entity_id) | (F.col("obj") == entity_id))
    return e.orderBy("pred", "src_url")


def q3_count_by_pred(edges: DataFrame) -> DataFrame:
    """TEST 3 analog (relationship-type census)."""
    return edges.groupBy("pred").count().orderBy(F.desc("count"))


def q4_mentions_per_entity_topk(edges: DataFrame, entities: DataFrame, k: int = 10) -> DataFrame:
    """TEST 6 analog (top CDs by CSD count): top-k entities by mention count
    — 1 hop + groupBy + TakeOrderedAndProject."""
    ent = entities.select("entity_id", "canonical_name", "entity_type")
    return (
        _edges(edges, "mentions")
        .groupBy("obj")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .join(F.broadcast(ent), F.col("obj") == ent.entity_id)
        .select("canonical_name", "entity_type", "n_mentions")
        .orderBy(F.desc("n_mentions"), F.asc("canonical_name"))
        .limit(k)
    )


def q5_two_hop_coparticipants(edges: DataFrame) -> DataFrame:
    """TEST 4/5 analog (2-hop pattern): pairs of persons who participated in
    the same event — join through the shared object."""
    p = _edges(edges, "participated_in").select("subj", "obj")
    a = p.withColumnRenamed("subj", "person_a")
    b = p.withColumnRenamed("subj", "person_b")
    return (
        a.join(b, "obj")
        .where(F.col("person_a") < F.col("person_b"))
        .groupBy("person_a", "person_b")
        .agg(F.countDistinct("obj").alias("n_shared_events"))
        .orderBy(F.desc("n_shared_events"), "person_a", "person_b")
    )


def q6_four_hop(edges: DataFrame, entities: DataFrame) -> DataFrame:
    """4-hop traversal analog (Place<-born_in-Person-signed->Treaty):
    which treaties were signed by people born in each place."""
    born = _edges(edges, "born_in").select(
        F.col("subj").alias("person"), F.col("obj").alias("birthplace")
    )
    signed = _edges(edges, "signed").select(
        F.col("subj").alias("person"), F.col("obj").alias("treaty")
    )
    names = entities.select("entity_id", "canonical_name")
    return (
        born.join(signed, "person")
        .groupBy("birthplace", "treaty")
        .agg(F.countDistinct("person").alias("n_signers"))
        .join(F.broadcast(names.withColumnRenamed("canonical_name", "birthplace_name")),
              F.col("birthplace") == F.col("entity_id"))
        .drop("entity_id")
        .join(F.broadcast(names.withColumnRenamed("canonical_name", "treaty_name")),
              F.col("treaty") == F.col("entity_id"))
        .select("birthplace_name", "treaty_name", "n_signers")
        .orderBy(F.desc("n_signers"), "birthplace_name", "treaty_name")
    )


def q7_aggregate_by_region(edges: DataFrame, entities: DataFrame) -> DataFrame:
    """census TEST 2 analog (sum by province): mention volume per
    admin_region with countDistinct."""
    return (
        _edges(edges, "mentions")
        .join(F.broadcast(entities), F.col("obj") == entities.entity_id)
        .groupBy("admin_region")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("obj").alias("n_entities"),
        )
        .orderBy(F.desc("n_mentions"))
    )


def q8_provenance_per_source(edges: DataFrame, k: int = 10) -> DataFrame:
    """census TEST 4 analog (measurements per source file): facts per page."""
    return (
        edges.where(F.col("pred") != "mentions")
        .groupBy("src_url")
        .agg(F.count(F.lit(1)).alias("n_facts"))
        .orderBy(F.desc("n_facts"), "src_url")
        .limit(k)
    )


def q9_pred_matrix(edges: DataFrame, entities: DataFrame) -> DataFrame:
    """census TEST 3 analog (category breakdown): predicate x subject-type
    contingency counts."""
    return (
        edges.join(F.broadcast(entities.select("entity_id", "entity_type")),
                   edges.subj == F.col("entity_id"), "left")
        .groupBy("pred", "entity_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("pred", "entity_type")
    )


def q10_top1_fact_per_entity(edges: DataFrame) -> DataFrame:
    """window query: each entity's most-attested outgoing relation
    (argmax via row_number — reference W1)."""
    counts = (
        edges.where(F.col("pred") != "mentions")
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).alias("n_sources"))
    )
    w = Window.partitionBy("subj").orderBy(F.desc("n_sources"), "pred", "obj")
    return counts.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")


def q11_orphan_entities(entities: DataFrame, edges: DataFrame) -> DataFrame:
    """anti-join QA query (reference's declared-vs-referenced place check,
    build_neo4j_cidoc_crm.py:306-313): vocabulary entities never mentioned."""
    mentioned = _edges(edges, "mentions").select(F.col("obj").alias("entity_id"))
    return entities.join(mentioned, "entity_id", "left_anti").select(
        "entity_id", "canonical_name", "entity_type"
    )


ALL = {
    "q1_entity_lookup": q1_entity_lookup,
    "q2_entity_timeline": q2_entity_timeline,
    "q3_count_by_pred": q3_count_by_pred,
    "q4_mentions_per_entity_topk": q4_mentions_per_entity_topk,
    "q5_two_hop_coparticipants": q5_two_hop_coparticipants,
    "q6_four_hop": q6_four_hop,
    "q7_aggregate_by_region": q7_aggregate_by_region,
    "q8_provenance_per_source": q8_provenance_per_source,
    "q9_pred_matrix": q9_pred_matrix,
    "q10_top1_fact_per_entity": q10_top1_fact_per_entity,
    "q11_orphan_entities": q11_orphan_entities,
}
