"""Turtle-subset parser (S20): pure-python grammar vs the distributed
mapInPandas path, plus integration with the long-table store operators."""

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.io.turtle import (
    RDF_TYPE,
    XSD,
    load_turtle,
    parse_turtle_text,
)

TTL = """\
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
@base <http://base.org/> .

# a comment
ex:alice a ex:Person ;
    ex:name "Alice" ;
    ex:age 42 ;
    ex:score 1.5 ;
    ex:active true ;
    ex:label "bonjour"@fr ;
    ex:joined "2024-01-02"^^xsd:date ;
    ex:knows ex:bob, _:anon .

<rel/path> ex:note "esc \\"q\\" \\n tab\\t u\\u0041" .
ex:a.b ex:p.q ex:v.w .
"""


def test_parse_turtle_text_semantics():
    rows = parse_turtle_text(TTL, default_graph="urn:g")
    d = {(s, p): (o, dt, lang) for s, p, o, dt, lang, _ in rows}
    ex = "http://example.org/"
    assert d[(ex + "alice", RDF_TYPE)] == (ex + "Person", None, None)
    assert d[(ex + "alice", ex + "name")] == ("Alice", None, None)
    assert d[(ex + "alice", ex + "age")] == ("42", XSD + "integer", None)
    assert d[(ex + "alice", ex + "score")] == ("1.5", XSD + "decimal", None)
    assert d[(ex + "alice", ex + "active")] == ("true", XSD + "boolean", None)
    assert d[(ex + "alice", ex + "label")] == ("bonjour", None, "fr")
    assert d[(ex + "alice", ex + "joined")] == ("2024-01-02", XSD + "date", None)
    # object list fans out to two triples
    knows = {o for s, p, o, *_ in rows if p == ex + "knows"}
    assert knows == {ex + "bob", "_:anon"}
    # base-relative subject + escapes + dotted names
    assert d[("http://base.org/rel/path", ex + "note")][0] == \
        'esc "q" \n tab\t uA'
    assert d[(ex + "a.b", ex + "p.q")] == (ex + "v.w", None, None)
    assert all(r[5] == "urn:g" for r in rows)


def test_parse_errors():
    with pytest.raises(ValueError, match="undeclared prefix"):
        parse_turtle_text("foo:x foo:y foo:z .")
    with pytest.raises(ValueError, match="parse error"):
        # blank-node property lists are outside the supported subset
        parse_turtle_text("@prefix ex: <http://e/> .\nex:x ex:y [ ex:z 1 ] .")
    with pytest.raises(ValueError, match="parse error"):
        parse_turtle_text('@prefix ex: <http://e/> . ex:a ex:b "unterminated')
    with pytest.raises(ValueError, match="end of turtle"):
        parse_turtle_text('@prefix ex: <http://e/> . ex:a ex:b ')


def test_load_turtle_distributed_matches_oracle(spark, tmp_path):
    ttl2 = """PREFIX ex: <http://example.org/>
ex:carol ex:name "Carol" ; a ex:Person .
"""
    (tmp_path / "a.ttl").write_text(TTL)
    (tmp_path / "b.ttl").write_text(ttl2)
    got = {tuple(r) for r in
           load_turtle(spark, str(tmp_path), default_graph="urn:g").collect()}
    want = {tuple(r) for r in
            parse_turtle_text(TTL, "urn:g") + parse_turtle_text(ttl2, "urn:g")}
    assert got == want
    assert len(got) == len(want)


def test_turtle_parses_ntriples_output(spark):
    """N-Triples is a subset of Turtle: serialize_lines output must parse
    identically through BOTH parsers (cross-validates escape handling)."""
    from kgraphmemory_spark.io.rdf import parse_lines, serialize_lines
    rows = [
        ("urn:e1", "urn:p", 'esc "q" \\back\nnl\ttab', None, None, "urn:g"),
        ("urn:e1", "urn:p2", "urn:e2", None, None, "urn:g"),
        ("_:b1", "urn:p3", "plain words", None, "en", "urn:g"),
        ("urn:e3", "urn:p4", "42", "http://www.w3.org/2001/XMLSchema#integer",
         None, "urn:g"),
    ]
    t = spark.createDataFrame(
        rows, "subject string, predicate string, object string, "
              "obj_datatype string, obj_lang string, graph string")
    nt_lines = [r.value for r in serialize_lines(t, fmt="ntriples").collect()]
    via_nt = {tuple(r) for r in
              parse_lines(spark.createDataFrame(
                  [(l,) for l in nt_lines], "value string")).collect()}
    via_ttl = {tuple(r) for r in parse_turtle_text("\n".join(nt_lines))}
    # align graph column (NT lines carry no graph; both parsers yield None)
    assert via_ttl == via_nt
    assert len(via_ttl) == len(rows)


def test_turtle_into_store_ops(spark, tmp_path):
    (tmp_path / "a.ttl").write_text(TTL)
    t = load_turtle(spark, str(tmp_path), default_graph="urn:g")
    from kgraphmemory_spark.operators.store import get_triples
    ex = "http://example.org/"
    hits = get_triples(t, s=ex + "alice", p=ex + "name").collect()
    assert [h.object for h in hits] == ["Alice"]
    # typed literal survives a URI-cascade delete of its lexical twin
    assert t.where(F.col("obj_datatype").isNotNull()).count() == 4
