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


def _token_pairs(docs: DataFrame) -> DataFrame:
    """(url, pos, a, b) for every adjacent token pair — ONE map-side pass:
    zip_with over two shifted slices + posexplode.  No per-element
    element_at lambdas (they allocate a struct array per row and dominated
    the profile at 250k pages), no shuffle."""
    toks = _tokens(docs).where(F.size("toks") >= 2)
    n = F.size("toks")
    pairs = F.zip_with(
        F.slice(F.col("toks"), 1, n - 1),
        F.slice(F.col("toks"), 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return toks.select(
        "url", F.posexplode(pairs).alias("pos", "p")
    ).select("url", "pos", F.col("p.a").alias("a"), F.col("p.b").alias("b"))


def extract_mentions(docs: DataFrame) -> DataFrame:
    """docs_clean → mentions(url, pos, surface, kind).

    Unigrams: every token.  Bigrams: adjacent pairs present in the phrase
    alias table (ngram blocking, semantics.BIGRAM_ALIASES).
    """
    toks = _tokens(docs)
    uni = toks.select(
        "url", F.posexplode("toks").alias("pos", "surface")
    ).withColumn("kind", F.lit("unigram"))

    big = (
        _token_pairs(docs)
        .select("url", "pos", F.concat_ws(" ", "a", "b").alias("surface"))
        .where(F.col("surface").isin(*sorted(BIGRAM_ALIASES)))
        .withColumn("kind", F.lit("bigram"))
    )
    return uni.unionByName(big)


def extract_raw_triples(docs: DataFrame) -> DataFrame:
    """docs_clean → raw_triples(url, pos, subj_surface, pred, obj_surface):
    token adjacency (rule-set stage 2)."""
    return _token_pairs(docs).select(
        "url",
        "pos",
        F.col("a").alias("subj_surface"),
        F.lit(REL_NEXT).alias("pred"),
        F.col("b").alias("obj_surface"),
    )
