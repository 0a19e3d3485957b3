"""KGraphMemory manager facade (memory.py) — full method parity with the
reference's multi-graph manager (kgraph_memory.py:8-270), with the
cross-graph operations verified to be single plans over shared tables
instead of per-graph loops."""

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.memory import KGraphMemory


@pytest.fixture()
def mem(spark):
    m = KGraphMemory(spark)
    ga = m.create_graph("site-a", "urn:graph:site-a")
    gb = m.create_graph("site-b", "urn:graph:site-b")
    people = spark.createDataFrame(
        [("urn:p1", "Ada Lovelace", 36), ("urn:p2", "Alan Turing", 41)],
        "uri string, name string, age long")
    docs = spark.createDataFrame(
        [("urn:d1", "Analytical Engine notes", 1843)],
        "uri string, name string, year long")
    ga.add_objects(people, uri_col="uri", type_uri="urn:kg:Person")
    gb.add_objects(docs, uri_col="uri", type_uri="urn:kg:Document")
    return m


def test_registry_contract(mem, spark):
    assert sorted(mem.list_graphs()) == ["site-a", "site-b"]
    assert mem.count() == 2
    assert mem.has_graph("site-a") and not mem.has_graph("nope")
    assert mem.get_graph("nope") is None
    # duplicate id raises, matching kgraph_memory.py:47-48
    with pytest.raises(ValueError, match="already exists"):
        mem.create_graph("site-a", "urn:other")


def test_triples_isolated_per_graph(mem):
    a = mem.get_graph("site-a")
    b = mem.get_graph("site-b")
    # 2 objects × (type + vitaltype + 2 props) = 8; ages are typed
    assert a.triples.count() == 8
    assert b.triples.count() == 4
    assert a.triples.where(F.col("graph") != "urn:graph:site-a").count() == 0
    # datatype mapping survives the shared-table round trip
    dt = (a.triples.where(F.col("predicate") == "urn:prop:age")
          .select("obj_datatype").distinct().collect())
    assert [r.obj_datatype for r in dt] == [
        "http://www.w3.org/2001/XMLSchema#integer"]


def test_per_graph_sparql(mem):
    rows = mem.get_graph("site-a").sparql_query(
        "SELECT ?s WHERE { ?s <urn:prop:name> \"Ada Lovelace\" . }"
    ).collect()
    assert [r.s for r in rows] == ["urn:p1"]
    assert mem.get_graph("site-b").sparql_ask(
        "ASK { ?s a <urn:kg:Document> . }") is True
    assert mem.get_graph("site-b").sparql_ask(
        "ASK { ?s a <urn:kg:Person> . }") is False


def test_all_stats_single_plan(mem):
    stats = {r.graph_id: r for r in mem.all_stats().collect()}
    assert stats["site-a"].rdf_triple_count == 8
    assert stats["site-a"].subject_count == 2
    assert stats["site-b"].rdf_triple_count == 4
    assert stats["site-a"].vector_record_count > 0
    ms = mem.memory_stats()
    assert ms["total_graphs"] == 2
    assert ms["total_rdf_triples"] == 12
    assert ms["total_vector_records"] == (
        stats["site-a"].vector_record_count
        + stats["site-b"].vector_record_count)


def test_graph_stats_and_missing(mem):
    s = mem.graph_stats("site-b")
    assert s["rdf_triple_count"] == 4 and s["graph_uri"] == "urn:graph:site-b"
    assert mem.graph_stats("nope") is None


def test_search_across_graphs_per_graph_topk(mem):
    hits = mem.search_across_graphs("Ada Lovelace", limit_per_graph=1)
    rows = hits.collect()
    by_graph = {r.graph_id: r for r in rows}
    # exactly one hit per graph (the window cap), best one first
    assert set(by_graph) == {"site-a", "site-b"}
    assert by_graph["site-a"].uri == "urn:p1"
    assert by_graph["site-a"].score > by_graph["site-b"].score


def test_sparql_across_graphs(mem):
    plans = mem.sparql_query_across_graphs(
        "SELECT ?s WHERE { ?s a ?t . } ")
    assert set(plans) == {"site-a", "site-b"}
    assert {r.s for r in plans["site-a"].collect()} == {"urn:p1", "urn:p2"}
    assert {r.s for r in plans["site-b"].collect()} == {"urn:d1"}


def test_partition_scoped_crud(mem):
    a = mem.get_graph("site-a")
    a.remove_object("urn:p1")
    # p1's triples and vectors gone from site-a ...
    assert a.triples.where(F.col("subject") == "urn:p1").count() == 0
    assert a.vectors.where(F.col("uri") == "urn:p1").count() == 0
    assert a.triples.count() == 4
    # ... site-b untouched
    assert mem.get_graph("site-b").triples.count() == 4
    a.clear()
    assert a.triples.count() == 0 and a.vectors.count() == 0
    assert mem.get_graph("site-b").triples.count() == 4
    assert mem.has_graph("site-a")        # registration survives clear


def test_remove_and_clear(mem):
    assert mem.remove_graph("site-b") is True
    assert mem.remove_graph("site-b") is False
    assert mem.list_graphs() == ["site-a"]
    assert mem.triples.where(F.col("graph_id") == "site-b").count() == 0
    assert mem.vectors.where(F.col("graph_id") == "site-b").count() == 0
    mem.clear_all()
    assert mem.count() == 0 and mem.triples.count() == 0


def test_register_pipeline_tables(spark):
    from kgraphmemory_spark import datagen
    from kgraphmemory_spark.pipeline import run_pipeline
    kg = run_pipeline(
        spark, spark.createDataFrame(
            datagen.generate_pages_rows(20, seed=31),
            schema=datagen.PAGE_SCHEMA),
        graph="urn:graph:web")
    m = KGraphMemory(spark)
    g = m.register_tables("web", kg)
    assert m.has_graph("web")
    assert g.triples.count() == kg.triples.count()
    view = g.view()                    # full single-graph facade
    assert view.stats().collect()[0].n_entities == kg.entities.count()
    # raw-triples graphs refuse the typed-table facade with a clear error
    g2 = m.create_graph("raw", "urn:graph:raw")
    with pytest.raises(ValueError, match="raw triples only"):
        g2.view()


def test_sparql_service_across_graphs(mem):
    """Every managed graph is a SERVICE endpoint under its graph_uri —
    one SPARQL string federates across memories in one plan (in-process
    Federated Query, sparql.py; the reference's manager has no
    cross-graph query at all, kgraph_memory.py:8-270)."""
    a = mem.get_graph("site-a")
    rows = a.sparql_query('''
        SELECT ?pname ?dname WHERE {
            ?p <urn:prop:name> ?pname .
            SERVICE <urn:graph:site-b> {
                ?d a <urn:kg:Document> .
                ?d <urn:prop:name> ?dname .
            }
        } ORDER BY ?pname''').collect()
    assert [(r.pname, r.dname) for r in rows] == [
        ("Ada Lovelace", "Analytical Engine notes"),
        ("Alan Turing", "Analytical Engine notes")]
    # endpoint registry follows the live registry: removed graph → SILENT
    # federates to the unit solution, non-SILENT raises
    assert "urn:graph:site-b" in mem.service_map()
    mem.remove_graph("site-b")
    assert "urn:graph:site-b" not in mem.service_map()
    a = mem.get_graph("site-a")
    rows = a.sparql_query('''
        SELECT ?pname WHERE {
            ?p <urn:prop:name> ?pname .
            SERVICE SILENT <urn:graph:site-b> { ?d ?q ?z }
        }''').collect()
    assert len(rows) == 2
