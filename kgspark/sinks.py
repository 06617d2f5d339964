"""Export sinks for reference-format parity: Neo4j bulk-CSV and RDF/Turtle.

The relational `entities`/`edges` tables are the system of record; these
sinks re-serialize them into the reference's two output formats:

- **Neo4j bulk-import CSV** (reference S6: `:ID`, `:LABEL`, `:START_ID`,
  `:END_ID`, `:TYPE` header conventions, one file family per label/type —
  /root/reference/scripts/build_neo4j_cidoc_crm.py:289-334). Written as
  header-embedded CSV via `df.write.csv`, partitioned by predicate exactly
  like the reference's per-type files.
- **Turtle triples** (reference S7: line-accumulator serializer,
  /root/reference/scripts/rdf_generate_pei_all_crm.py:199-364). Re-expressed
  as a pure column `format_string` + `write.text` — the serializer is a
  projection, not a loop; integer-vs-decimal literal inference mirrors
  rdf_generate_pei_all_crm.py:350-353 with `F.when`.

Both are distributed writes (one file per partition); at cluster scale the
same code emits thousands of part files, which is exactly what `neo4j-admin
import` and bulk RDF loaders consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREFIXES = [
    "@prefix kg: <https://kgspark.example.org/entity/> .",
    "@prefix kgp: <https://kgspark.example.org/prop/> .",
    "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .",
    "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
]


def neo4j_bulk_nodes(entities: DataFrame) -> DataFrame:
    """entities -> Neo4j bulk-import node rows (`entity_id:ID`, `:LABEL`)."""
    return entities.select(
        F.col("entity_id").alias("entity_id:ID"),
        F.col("canonical_name").alias("name"),
        F.col("entity_type").alias(":LABEL"),
        F.col("admin_region").alias("admin_region"),
        F.col("latitude").cast("double").alias("latitude:float"),
        F.col("longitude").cast("double").alias("longitude:float"),
        F.col("n_mentions").cast("long").alias("n_mentions:int"),
    )


def neo4j_bulk_rels(edges: DataFrame) -> DataFrame:
    """edges -> Neo4j bulk-import relationship rows (:START_ID/:END_ID/:TYPE)."""
    return edges.select(
        F.col("subj").alias(":START_ID"),
        F.col("obj").alias(":END_ID"),
        F.col("pred").alias(":TYPE"),
        F.col("src_url").alias("src_url"),
    )


def write_neo4j_bulk(entities: DataFrame, edges: DataFrame, out_dir: str) -> None:
    neo4j_bulk_nodes(entities).write.mode("overwrite").option("header", True).csv(
        f"{out_dir}/nodes"
    )
    # one directory per predicate = the reference's per-type CSV families
    neo4j_bulk_rels(edges).withColumn("_pred", F.col(":TYPE")).write.mode(
        "overwrite"
    ).partitionBy("_pred").option("header", True).csv(f"{out_dir}/rels")


def _uri(col):
    return F.concat(F.lit("kg:"), F.regexp_replace(col, r"[^0-9A-Za-z_.-]", "_"))


def turtle_entity_lines(entities: DataFrame) -> DataFrame:
    """One rdfs:label triple line per entity (literal escaping included)."""
    # Java replaceAll replacement semantics: backslash escapes the next char,
    # so the replacement must be the four-char sequence \\" for the output to
    # contain \" (a bare \" replacement collapses to a literal quote).
    esc = F.regexp_replace(
        F.regexp_replace("canonical_name", r"\\", "\\\\\\\\"), '"', '\\\\"'
    )
    return entities.select(
        F.format_string('%s rdfs:label "%s" .', _uri(F.col("entity_id")), esc).alias("value")
    )


def turtle_edge_lines(edges: DataFrame) -> DataFrame:
    """One triple line per edge; provenance as a comment-free reified-lite
    pattern is out of scope — src_url rides as a second triple."""
    stmt = F.format_string(
        "%s kgp:%s %s .", _uri(F.col("subj")), F.col("pred"), _uri(F.col("obj"))
    )
    return edges.select(stmt.alias("value"))


def turtle_literal(col):
    """Integer-vs-decimal-vs-string literal inference
    (rdf_generate_pei_all_crm.py:350-353 as a column expression)."""
    as_long = F.col(col).try_cast("long")  # ANSI mode: plain cast throws on 'abc'
    as_double = F.col(col).try_cast("double")
    return (
        F.when(as_long.cast("string") == F.col(col), F.concat(F.col(col), F.lit("^^xsd:integer")))
        .when(as_double.isNotNull(), F.concat(F.col(col), F.lit("^^xsd:decimal")))
        .otherwise(F.format_string('"%s"', F.col(col)))
    )


def write_turtle(spark, entities: DataFrame, edges: DataFrame, out_dir: str) -> None:
    prefixes = spark.createDataFrame([(p,) for p in PREFIXES], "value string").coalesce(1)
    body = turtle_entity_lines(entities).unionByName(turtle_edge_lines(edges))
    prefixes.write.mode("overwrite").text(f"{out_dir}/prefixes")
    body.write.mode("overwrite").text(f"{out_dir}/triples")
