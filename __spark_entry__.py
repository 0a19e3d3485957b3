"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``  — flagship: run the full KG-construction pipeline over
  /root/testdata/sf0.001 documents (lifted to the north-rule page schema)
  and return the WordNet-shape frame reconstruction join (SURVEY.md §2.3 J3)
  enriched with relation weights.
- ``queries()`` / ``oracle_sql()`` — the operator battery; see
  kgraphmemory_spark/queries.py for the registry (each entry documents the
  SURVEY.md §2 operator ids it covers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgraphmemory_spark import queries as Q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    Q._prep(spark)
    kg = Q.kg_tables(spark, SF0001)
    from kgraphmemory_spark.semantics import SLOT_DESTINATION, SLOT_SOURCE

    src = kg.slots.where(F.col("slot_type") == SLOT_SOURCE).select(
        "frame_uri", F.col("entity_value").alias("source_entity"))
    dst = kg.slots.where(F.col("slot_type") == SLOT_DESTINATION).select(
        "frame_uri", F.col("entity_value").alias("destination_entity"))
    rel = kg.relations.select(
        F.col("subj").alias("source_entity"),
        F.col("obj").alias("destination_entity"),
        "weight", "ndocs")
    return (
        kg.frames.select("frame_uri", "frame_type")
        .join(src, "frame_uri")
        .join(dst, "frame_uri")
        .join(rel, ["source_entity", "destination_entity"])
        .select("source_entity", "frame_type", "destination_entity",
                "weight", "ndocs")
        .orderBy(F.desc("weight"), "source_entity", "destination_entity")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
