"""KGraphView facade: reference API-surface parity over a small built
graph (methods mirror kgraph.py / kgraph_bridge_utilities.py read paths)."""

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark import datagen
from kgraphmemory_spark.api import KGraphView
from kgraphmemory_spark.pipeline import run_pipeline
from kgraphmemory_spark.semantics import TYPE_PHRASE, TYPE_TOKEN


@pytest.fixture(scope="module")
def view(spark):
    rows = datagen.generate_pages_rows(60, seed=5)
    kg = run_pipeline(spark, spark.createDataFrame(
        rows, schema=datagen.PAGE_SCHEMA))
    return KGraphView(kg)


def test_get_object_and_batch(view):
    one = view.get_object("ent:the").collect()
    assert len(one) == 1 and one[0].entity_type == TYPE_TOKEN
    batch = view.get_objects(["ent:the", "ent:data", "ent:nope"]).collect()
    assert {r.entity_id for r in batch} == {"ent:the", "ent:data"}


def test_objects_by_type_and_filter(view):
    toks = view.objects_by_type(TYPE_TOKEN)
    assert toks.count() > 5
    assert view.objects_by_type(TYPE_TOKEN, limit=3).count() == 3
    f = view.filter_by_property("name", "data").collect()
    assert [r.entity_id for r in f] == ["ent:data"]


def test_object_type_from_triples(view):
    rows = view.object_type("ent:the").collect()
    assert rows and rows[0].entity_type == TYPE_TOKEN


def test_ask(view):
    assert view.ask(view.get_object("ent:the"))
    assert not view.ask(view.get_object("ent:never-seen"))


def test_linked_objects_directions(view):
    out = {r.entity_id for r in view.linked_objects("ent:the", "out").collect()}
    inn = {r.entity_id for r in view.linked_objects("ent:the", "in").collect()}
    both = {r.entity_id for r in view.linked_objects("ent:the", "both").collect()}
    assert out and inn
    assert both == out | inn
    # neighbors come back joined with entity attributes
    sample = view.linked_objects("ent:the", "out").first()
    assert sample.entity_type in (TYPE_TOKEN, TYPE_PHRASE)
    assert sample.weight >= 1


def test_frame_traversal(view):
    rel = view.kg.relations.first()
    frames = view.frames_for_entity(rel.subj)
    assert frames.count() >= 1
    f = frames.first()
    slots = view.frame_slots(f.frame_uri).collect()
    assert len(slots) == 2
    assert {s.slot_type for s in slots} == {
        "urn:hasSourceEntity", "urn:hasDestinationEntity"}


def test_vector_and_hybrid(view):
    hits = view.vector_search("data", limit=3,
                              vector_id="entity_value").collect()
    assert hits[0].uri == "ent:data"
    cand = view.objects_by_type(TYPE_TOKEN)
    h = view.hybrid_search("data", cand, limit=3,
                           vector_id="entity_value").collect()
    assert h[0].uri == "ent:data"
    ov = view.object_vectors("ent:data").collect()
    assert {r.vector_id for r in ov} == {"entity_value", "entity_type", "general"}


def test_stats(view):
    s = view.stats().collect()[0]
    assert s.n_entities == view.kg.entities.count()
    assert s.n_relations == view.kg.relations.count()
    assert s.n_triples > 0


def test_serialize_facade(view):
    """KGraphView.serialize mirrors the reference's store dump
    (kgraph_rdf_db.py:523-547): default turtle, reference spellings,
    round-trips through the engine's own parsers."""
    from kgraphmemory_spark.io.rdfxml import parse_rdfxml_text
    from kgraphmemory_spark.io.turtle import parse_turtle_text

    want = {(r["subject"], r["predicate"], r["object"])
            for r in view.kg.triples.collect()}
    assert len(want) > 0
    ttl = view.serialize()
    got = {(s, p, o) for s, p, o, _, _, _ in parse_turtle_text(ttl)}
    assert got == want
    xml = view.serialize("rdf/xml")
    assert {(s, p, o) for s, p, o, *_ in parse_rdfxml_text(xml)} == want
    rows = view.serialize_df("nt")
    assert rows.columns == ["value"] and rows.count() == len(want)
