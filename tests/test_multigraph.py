"""J10 cross-graph semantics: the reference's KGraphMemory loops one query
per graph (kgraph_memory.py:184-245); here N graphs live in ONE triples
table under a `graph` partition column and a single grouped query replaces
the fan-out loop."""

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark import datagen
from kgraphmemory_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def two_graphs(spark):
    a = run_pipeline(
        spark, spark.createDataFrame(
            datagen.generate_pages_rows(40, seed=21),
            schema=datagen.PAGE_SCHEMA),
        graph="urn:graph:site-a")
    b = run_pipeline(
        spark, spark.createDataFrame(
            datagen.generate_pages_rows(25, seed=22),
            schema=datagen.PAGE_SCHEMA),
        graph="urn:graph:site-b")
    return a, b, a.triples.unionByName(b.triples).cache()


def test_per_graph_counts_one_query(two_graphs):
    a, b, union = two_graphs
    got = {r.graph: r.n for r in
           union.groupBy("graph").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"urn:graph:site-a": a.triples.count(),
                   "urn:graph:site-b": b.triples.count()}


def test_graph_scoping_filters(two_graphs):
    a, _b, union = two_graphs
    scoped = union.where(F.col("graph") == "urn:graph:site-a")
    assert scoped.count() == a.triples.count()
    assert (scoped.select("subject", "predicate", "object")
            .exceptAll(a.triples.select("subject", "predicate", "object"))
            .count() == 0)


def test_cross_graph_search_union(two_graphs):
    """search_all across graphs (kgraph_memory.py:199-223) == one filter
    over the union, grouped by graph."""
    _a, _b, union = two_graphs
    hits = (
        union.where(F.col("predicate")
                    == "http://vital.ai/ontology/vital-core#hasName")
        .where(F.col("object") == "the")
        .groupBy("graph").agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r.graph: r.n for r in hits.collect()}
    assert set(got) == {"urn:graph:site-a", "urn:graph:site-b"}
    assert all(n == 1 for n in got.values())
