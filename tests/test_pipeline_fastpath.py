"""The doc-aggregated relations fast path (extract_canonical_pair_counts
+ build_relations_docagg) must be row-identical to the pre-aggregated
shuffle path (build_relations) — including the subtle case where two
surface pairs in the SAME document merge under canonicalization (ndocs
must count that document once, like the shuffle path's countDistinct)."""

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.operators.extraction import (
    extract_canonical_pair_counts,
    extract_docs,
    extract_raw_triples,
)
from kgraphmemory_spark.operators.materialize import (
    build_relations,
    build_relations_docagg,
)


def _rows(df):
    return sorted((r.subj, r.pred, r.obj, r.weight, r.ndocs)
                  for r in df.collect())


@pytest.fixture()
def docs(spark):
    # "group by" and "agg by" in doc A merge to the same canonical pair
    # (group→agg) — the per-doc-dedup edge case; doc B has repeats for
    # weight; doc C is empty text; doc D a single token (no pairs).
    rows = [
        ("a", None, None, "group by agg by", "en"),
        ("b", None, None, "scan scan scan", "en"),
        ("c", None, None, "", "en"),
        ("d", None, None, "scan", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
    return extract_docs(pages)


@pytest.fixture()
def canonical(spark):
    # group → agg (synonym merge), everything else self-mapped
    toks = ["group", "by", "agg", "scan"]
    return spark.createDataFrame(
        [("ent:" + t, "ent:agg" if t == "group" else "ent:" + t)
         for t in toks],
        "entity_id string, canonical_id string")


def test_fastpath_equals_shuffle_path(docs, canonical):
    shuffle_path = build_relations(
        extract_raw_triples(docs), canonical, broadcast_canonical=True)
    cmap = {r.entity_id: r.canonical_id for r in canonical.collect()}
    fast = build_relations_docagg(
        extract_canonical_pair_counts(docs, cmap))
    assert _rows(fast) == _rows(shuffle_path)
    # the merge case concretely: doc a emits (agg,by) twice via two
    # different surface pairs and (by,agg) once — ndocs stays 1
    got = {(r.subj, r.obj): (r.weight, r.ndocs) for r in fast.collect()}
    assert got[("ent:agg", "ent:by")] == (2, 1)
    assert got[("ent:by", "ent:agg")] == (1, 1)
    assert got[("ent:scan", "ent:scan")] == (2, 1)


def test_fastpath_drops_unmapped_tokens(docs, canonical, spark):
    # mirror the shuffle path's inner probe join: a token absent from the
    # canonical map contributes no pairs on either path
    partial = canonical.where(F.col("entity_id") != "ent:scan")
    cmap = {r.entity_id: r.canonical_id for r in partial.collect()}
    fast = build_relations_docagg(
        extract_canonical_pair_counts(docs, cmap))
    shuffle_path = build_relations(
        extract_raw_triples(docs), partial, broadcast_canonical=True)
    assert _rows(fast) == _rows(shuffle_path)
    assert all(r.subj != "ent:scan" and r.obj != "ent:scan"
               for r in fast.collect())


def test_pipeline_uses_fastpath_and_matches_oracle(spark):
    # full pipeline (which now routes relations through the fast path for
    # bounded vocabularies) still matches the pure-python oracle
    from kgraphmemory_spark import datagen, semantics
    from kgraphmemory_spark.pipeline import run_pipeline
    rows = datagen.generate_pages_rows(60, seed=11)
    kg = run_pipeline(spark, spark.createDataFrame(
        rows, schema=datagen.PAGE_SCHEMA))
    oracle = semantics.build_kg(rows)
    got = {(r.subj, r.pred, r.obj, r.weight, r.ndocs)
           for r in kg.relations.collect()}
    want = {(r["subj"], r["pred"], r["obj"], r["weight"], r["ndocs"])
            for r in oracle.relations}
    assert got == want
