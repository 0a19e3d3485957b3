"""Stage 3: entity linking — candidate generation + ranking.

The linking join is THE skew point at web scale: mention surfaces follow a
Zipf law ("the"-class hub tokens, wikipedia-scale head entities), so a naive
shuffle join on `surface` piles the head keys onto single tasks.  Three
strategies, selected by `strategy=`:

- ``broadcast`` — alias table small enough to broadcast (the common case
  when aliases fit in executor memory; no shuffle at all);
- ``salted``    — explode the alias table ×SALT, salt each mention by a
  content hash, join on (surface, salt): head keys spread over SALT tasks;
- ``shuffle``   — plain shuffle join, AQE skew-join splitting enabled
  (spark.sql.adaptive.skewJoin.enabled, see session.py).

All three produce identical rows (asserted in tests/test_linking.py).

Ranking (SURVEY.md §2.5 W2): best candidate per mention via
row_number() over (url,pos,kind) ordered by score desc, entity_id — the
reference's take-first-hit loop (kginteraction_graph.py:97-126) as a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..semantics import BIGRAM_ALIASES

DEFAULT_SALT = 16


def discovered_alias_table(mentions: DataFrame) -> DataFrame:
    """Open-vocabulary alias table: every distinct unigram surface maps to
    the deterministic entity id `ent:<surface>`; bigram surfaces map per
    the fixed phrase table.  → (surface, kind, entity_id, prior)."""
    uni = (
        mentions.where(F.col("kind") == "unigram")
        .select("surface").distinct()
        .select(
            "surface",
            F.lit("unigram").alias("kind"),
            F.concat(F.lit("ent:"), F.col("surface")).alias("entity_id"),
            F.lit(1.0).alias("prior"),
        )
    )
    spark = mentions.sparkSession
    big = spark.createDataFrame(
        [(k, "bigram", v, 1.0) for k, v in sorted(BIGRAM_ALIASES.items())],
        "surface string, kind string, entity_id string, prior double",
    )
    return uni.unionByName(big)


def link_mentions(
    mentions: DataFrame,
    alias_table: DataFrame,
    strategy: str = "broadcast",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """mentions(url,pos,surface,kind) ⋈ alias(surface,kind,entity_id,prior)
    → linked(url, pos, surface, kind, entity_id, link_score), one row per
    mention (best candidate; ties broken by entity_id asc → deterministic).
    """
    if strategy == "broadcast":
        cand = mentions.join(
            F.broadcast(alias_table), ["surface", "kind"], "inner"
        )
    elif strategy == "salted":
        salted_m = mentions.withColumn(
            "_salt", F.pmod(F.xxhash64("url", "pos"), F.lit(salt)).cast("int")
        )
        salted_a = alias_table.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        cand = salted_m.join(
            salted_a, ["surface", "kind", "_salt"], "inner"
        ).drop("_salt")
    elif strategy == "shuffle":
        cand = mentions.join(alias_table, ["surface", "kind"], "inner")
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    cand = cand.withColumn("link_score", F.col("prior"))
    w = Window.partitionBy("url", "pos", "kind").orderBy(
        F.desc("link_score"), F.asc("entity_id")
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", "pos", "surface", "kind", "entity_id", "link_score")
    )


def link_score_histogram(linked: DataFrame, buckets: int = 10) -> DataFrame:
    """Per-bucket link-score histogram — the lineage metric demanded by the
    north rule (BASELINE.json: 'link-score histograms')."""
    return (
        linked.select(
            F.least(
                F.floor(F.col("link_score") * buckets).cast("int"),
                F.lit(buckets - 1),
            ).alias("score_bucket")
        )
        .groupBy("score_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("score_bucket")
    )
