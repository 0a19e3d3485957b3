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
        parse_turtle_text('@prefix ex: <http://e/> . ex:a ex:b "unterminated')
    with pytest.raises(ValueError, match="end of turtle"):
        parse_turtle_text('@prefix ex: <http://e/> . ex:a ex:b ')


def test_load_turtle_distributed_matches_oracle(spark, tmp_path):
    ttl2 = """PREFIX ex: <http://example.org/>
ex:carol ex:name "Carol" ; a ex:Person .
"""
    (tmp_path / "a.ttl").write_text(TTL)
    (tmp_path / "b.ttl").write_text(ttl2)
    # multi-file load scopes bnode labels per file (r4) — normalize the
    # deterministic --f<hex> suffix away before comparing to the
    # per-document oracle
    import re as _re

    def norm(v):
        return _re.sub(r"--f[0-9a-f]{8}$", "", v) if isinstance(v, str) \
            else v

    got = {tuple(norm(v) for v in r) for r in
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


# ----------------------- round 3: [...] property lists + (...) collections

from kgraphmemory_spark.io.turtle import RDF_FIRST, RDF_NIL, RDF_REST


def _spo(rows):
    return {(s, p, o) for s, p, o, _, _, _ in rows}


def test_bnode_property_list_as_object():
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "ex:a ex:knows [ a ex:Person ; ex:name \"Bob\" , \"Bobby\" ] .")
    spo = _spo(rows)
    inner = [o for s, p, o in spo if p == "http://e/knows"][0]
    assert inner.startswith("_:")
    assert (inner, RDF_TYPE, "http://e/Person") in spo
    names = {o for s, p, o in spo if s == inner and p == "http://e/name"}
    assert names == {"Bob", "Bobby"}
    assert len(rows) == 4


def test_bnode_property_list_as_subject_standalone():
    # `[ p o ] .` is a complete statement; `[] p o .` continues normally
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "[ ex:p ex:q ] .\n"
        "[] ex:r 4 .")
    assert len(rows) == 2
    (s1, p1, o1, *_), (s2, p2, o2, dt2, *_) = rows
    assert s1.startswith("_:") and (p1, o1) == ("http://e/p", "http://e/q")
    assert s2.startswith("_:") and s2 != s1
    assert (p2, o2, dt2) == ("http://e/r", "4", XSD + "integer")


def test_bnode_property_list_subject_with_predicates():
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "[ ex:inner 1 ] ex:outer ex:x .")
    spo = _spo(rows)
    subj = [s for s, p, o in spo if p == "http://e/outer"][0]
    assert (subj, "http://e/inner", "1") in spo
    assert len(rows) == 2


def test_nested_property_lists():
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "ex:a ex:p [ ex:q [ ex:r \"deep\" ] ; ex:s 1 ] .")
    spo = _spo(rows)
    lvl1 = [o for s, p, o in spo if p == "http://e/p"][0]
    lvl2 = [o for s, p, o in spo if s == lvl1 and p == "http://e/q"][0]
    assert (lvl2, "http://e/r", "deep") in spo
    assert (lvl1, "http://e/s", "1") in spo
    assert len(rows) == 4


def test_collection_desugars_to_first_rest_chain():
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "ex:a ex:list (ex:x \"two\"@en 3) .")
    spo = _spo(rows)
    head = [o for s, p, o in spo if p == "http://e/list"][0]
    # walk the chain
    chain, node = [], head
    while node != RDF_NIL:
        first = [r for r in rows if r[0] == node and r[1] == RDF_FIRST][0]
        chain.append((first[2], first[3], first[4]))
        node = [o for s, p, o in spo if s == node and p == RDF_REST][0]
    assert chain == [("http://e/x", None, None), ("two", None, "en"),
                     ("3", XSD + "integer", None)]
    assert len(rows) == 7  # 1 link + 3×(first, rest)


def test_empty_collection_is_nil():
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> . ex:a ex:list () .")
    assert rows == [("http://e/a", "http://e/list", RDF_NIL,
                     None, None, None)]


def test_collection_of_property_lists_nested():
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "ex:a ex:l ([ ex:k 1 ] ()) .")
    spo = _spo(rows)
    head = [o for s, p, o in spo if p == "http://e/l"][0]
    cell1_first = [o for s, p, o in spo if s == head and p == RDF_FIRST][0]
    assert (cell1_first, "http://e/k", "1") in spo
    cell2 = [o for s, p, o in spo if s == head and p == RDF_REST][0]
    assert (cell2, RDF_FIRST, RDF_NIL) in spo
    assert (cell2, RDF_REST, RDF_NIL) in spo


def test_unterminated_forms_raise():
    import pytest
    with pytest.raises(ValueError):
        parse_turtle_text("@prefix ex: <http://e/> . ex:a ex:p [ ex:q 1 .")
    with pytest.raises(ValueError):
        parse_turtle_text("@prefix ex: <http://e/> . ex:a ex:p (1 2 .")


def test_plists_inside_trig_block_carry_graph():
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "GRAPH ex:g { ex:a ex:p [ ex:q (1) ] }", default_graph="urn:d")
    assert {r[5] for r in rows} == {"http://e/g"}
    assert len(rows) == 4


def test_plist_collection_distributed_matches_oracle(spark, tmp_path):
    ttl = ("@prefix ex: <http://e/> .\n"
           "ex:a ex:knows [ a ex:Person ; ex:likes (ex:x ex:y) ] .\n"
           "[ ex:standalone true ] .\n")
    (tmp_path / "a.ttl").write_text(ttl)
    from kgraphmemory_spark.io.rdf import import_rdf
    df = import_rdf(spark, str(tmp_path), fmt="turtle", default_graph="g")
    assert ({tuple(r) for r in df.collect()}
            == set(parse_turtle_text(ttl, "g")))


def test_long_and_single_quoted_literals():
    ttl = '''@prefix ex: <http://e/> .
ex:a ex:p """multi
line with "quotes" and ""pairs"" inside"""@en ;
     ex:q 'single' ;
     ex:r \'\'\'long
single with 'quote' end\'\'\'^^ex:dt ;
     ex:s "plain" .
'''
    rows = parse_turtle_text(ttl)
    d = {p: (o, dt, lang) for s, p, o, dt, lang, g in rows}
    assert d["http://e/p"] == (
        'multi\nline with "quotes" and ""pairs"" inside', None, "en")
    assert d["http://e/q"] == ("single", None, None)
    assert d["http://e/r"] == ("long\nsingle with 'quote' end",
                               "http://e/dt", None)
    assert d["http://e/s"] == ("plain", None, None)


def test_long_literal_in_collection_and_plist():
    rows = parse_turtle_text(
        '@prefix ex: <http://e/> . ex:a ex:l ("""x y""" [ ex:k \'v\' ]) .')
    objs = {(o, dt, lang) for s, p, o, dt, lang, g in rows}
    assert ("x y", None, None) in objs
    assert ("v", None, None) in objs


def test_numeric_exponent_and_leading_dot_forms():
    """Turtle numeric shorthand: exponent → xsd:double, leading-dot
    decimal, trailing `5.` stays integer + statement dot."""
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> .\n"
        "ex:a ex:p 1e3 , -2.5E-2 , .5 , 5.0e0 , .5e-2 .\n"
        "ex:b ex:q 5.")
    vals = {(o, dt.rsplit('#', 1)[1]) for _, _, o, dt, _, _ in rows}
    assert vals == {("1e3", "double"), ("-2.5E-2", "double"),
                    (".5", "decimal"), ("5.0e0", "double"),
                    (".5e-2", "double"), ("5", "integer")}
