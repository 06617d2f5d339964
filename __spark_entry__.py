"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — the full KG-construction pipeline
  (extract -> mentions -> link -> canonicalize -> materialize) on the
  deterministic fixture corpus, returning the (subj, pred, obj, src_url)
  triple DataFrame.
- ``queries()``: one entry per implemented operator family from
  SURVEY.md §2 + the training-data ops (dedup / ANN / text analysis);
  implementations live in kgspark/entry_queries.py.
- ``oracle_sql()``: DuckDB-runnable ANSI SQL equivalents (same column
  names; fixed-point/decimal conventions documented in entry_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from kgspark.entry_queries import kg_pipeline_triples

    # runs interpreted internally and restores session conf (see docstring)
    return kg_pipeline_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgspark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kgspark.entry_queries import ORACLES

    return dict(ORACLES)
