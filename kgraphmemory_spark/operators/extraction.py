"""Stage 1-2: page extraction, mention detection, raw triple extraction.

Everything except the HTML→text decode is pure `pyspark.sql.functions`
(whole-stage codegen): tokenization = `split`, mention/adjacency fan-out =
`posexplode`/`transform` over token arrays.  The HTML decode is the one
mandated pandas UDF (Arrow-batched) and wraps the SAME pure function the
pytest oracle uses (`semantics.extract_text`) — the byte-identical-text
invariant holds by construction.

Rule-set: semantics.py (webtext-v1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import extract_text_udf
from ..semantics import BIGRAM_ALIASES, REL_NEXT


def extract_docs(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → docs_clean(url, warc_ts,
    text, lang, text_sha).  html wins over provided text when present."""
    text = F.when(
        F.col("html").isNotNull(), extract_text_udf(F.col("html"))
    ).otherwise(F.coalesce(F.col("text"), F.lit("")))
    return pages.select(
        "url",
        "warc_ts",
        text.alias("text"),
        "lang",
    ).withColumn("text_sha", F.sha2(F.col("text"), 256))


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "url", F.split("text", " ").alias("toks")
    ).where(F.length("text") > 0)


def extract_mentions(docs: DataFrame) -> DataFrame:
    """docs_clean → mentions(url, pos, surface, kind).

    Unigrams: every token.  Bigrams: adjacent pairs present in the phrase
    alias table (ngram blocking, semantics.BIGRAM_ALIASES).
    """
    toks = _tokens(docs)
    uni = toks.select(
        "url", F.posexplode("toks").alias("pos", "surface")
    ).withColumn("kind", F.lit("unigram"))

    bigram_keys = F.array(*[F.lit(k) for k in sorted(BIGRAM_ALIASES)])
    pairs = toks.where(F.size("toks") >= 2).select(
        "url",
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(
                            " ",
                            F.element_at("toks", i + 1),
                            F.element_at("toks", i + 2),
                        ).alias("surface"),
                    ),
                ),
                lambda s: F.array_contains(bigram_keys, s["surface"]),
            )
        ).alias("m"),
    ).select("url", F.col("m.pos").alias("pos"), F.col("m.surface").alias("surface"))
    big = pairs.withColumn("kind", F.lit("bigram"))
    return uni.unionByName(big)


def extract_raw_triples(docs: DataFrame) -> DataFrame:
    """docs_clean → raw_triples(url, pos, subj_surface, pred, obj_surface):
    token adjacency (rule-set stage 2)."""
    toks = _tokens(docs).where(F.size("toks") >= 2)
    return toks.select(
        "url",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.element_at("toks", i + 1).alias("subj_surface"),
                    F.element_at("toks", i + 2).alias("obj_surface"),
                ),
            )
        ).alias("t"),
    ).select(
        "url",
        F.col("t.pos").alias("pos"),
        F.col("t.subj_surface").alias("subj_surface"),
        F.lit(REL_NEXT).alias("pred"),
        F.col("t.obj_surface").alias("obj_surface"),
    )
