"""S20 non-line formats: TriG graph blocks, JSON-LD subset, RDF/XML
subset — pure-python grammar vs the distributed wholetext+mapInPandas
path, plus the `import_rdf` format dispatch (the reference's RdfFormat
table, kgraph_rdf_db.py:493-511)."""

import pytest

from kgraphmemory_spark.io.jsonld import parse_jsonld_text
from kgraphmemory_spark.io.rdf import import_rdf
from kgraphmemory_spark.io.rdfxml import parse_rdfxml_text
from kgraphmemory_spark.io.turtle import RDF_TYPE, XSD, parse_turtle_text

EX = "http://example.org/"

TRIG = """\
@prefix ex: <http://example.org/> .
ex:outside ex:p "top" .
GRAPH ex:g1 {
  ex:a ex:b ex:c .
  ex:a ex:n 42
}
<http://example.org/g2> {
  ex:d a ex:T ;
       ex:label "hi"@en , "deux"@fr .
}
{ ex:anon ex:p true . }
graph _:bg { _:s ex:p "x"^^ex:dt }
ex:after ex:p ex:q .
"""

JSONLD = """{
  "@context": {"ex": "http://example.org/", "name": "http://example.org/name",
               "knows": {"@id": "http://example.org/knows", "@type": "@id"},
               "@vocab": "http://vocab.org/", "@base": "http://base.org/"},
  "@graph": [
    {"@id": "ex:alice", "@type": "ex:Person", "name": "Alice",
     "age": 30, "score": 1.5, "active": true,
     "knows": ["ex:bob", "rel"],
     "note": {"@value": "bonjour", "@language": "fr"},
     "height": {"@value": "1.7", "@type": "ex:metres"},
     "pet": {"@type": "ex:Cat", "name": "Tom"}}
  ]
}"""

RDFXML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/" xml:lang="en">
  <ex:Person rdf:about="http://example.org/alice" ex:nick="Al">
    <ex:name>Alice</ex:name>
    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
    <ex:knows rdf:resource="http://example.org/bob"/>
    <ex:pet><ex:Cat><ex:name xml:lang="fr">Tom</ex:name></ex:Cat></ex:pet>
    <ex:addr rdf:parseType="Resource"><ex:city>Paris</ex:city></ex:addr>
    <ex:friend rdf:nodeID="b7"/>
  </ex:Person>
  <rdf:Description rdf:nodeID="b7"><ex:name>Bob</ex:name></rdf:Description>
</rdf:RDF>"""


# ---------------------------------------------------------------- TriG

def test_trig_graph_blocks():
    rows = parse_turtle_text(TRIG, default_graph="urn:d")
    graphs = {(s, p, o): g for s, p, o, _, _, g in rows}
    # triples outside any block keep the default graph
    assert graphs[(EX + "outside", EX + "p", "top")] == "urn:d"
    assert graphs[(EX + "after", EX + "p", EX + "q")] == "urn:d"
    # GRAPH <name> { } — final '.' optional inside the block
    assert graphs[(EX + "a", EX + "b", EX + "c")] == EX + "g1"
    assert graphs[(EX + "a", EX + "n", "42")] == EX + "g1"
    # bare <iri> { } with predicate/object lists
    assert graphs[(EX + "d", RDF_TYPE, EX + "T")] == EX + "g2"
    langs = {(o, lang) for s, p, o, _, lang, g in rows
             if p == EX + "label" and g == EX + "g2"}
    assert langs == {("hi", "en"), ("deux", "fr")}
    # anonymous { } block → default graph; blank-node graph name kept
    assert graphs[(EX + "anon", EX + "p", "true")] == "urn:d"
    assert graphs[("_:s", EX + "p", "x")] == "_:bg"
    assert len(rows) == 9


def test_trig_unterminated_block_raises():
    with pytest.raises(ValueError, match="unterminated graph block"):
        parse_turtle_text("@prefix ex: <http://e/> .\n"
                          "GRAPH ex:g { ex:a ex:b ex:c .")


def test_plain_turtle_unchanged_by_trig_support():
    rows = parse_turtle_text(
        "@prefix ex: <http://e/> . ex:a ex:b ex:c .", "urn:d")
    assert rows == [("http://e/a", "http://e/b", "http://e/c",
                     None, None, "urn:d")]


# ------------------------------------------------------------- JSON-LD

def test_jsonld_semantics():
    rows = parse_jsonld_text(JSONLD, default_graph="urn:d")
    d = {(s, p): (o, dt, lang) for s, p, o, dt, lang, _ in rows}
    a = EX + "alice"
    assert d[(a, RDF_TYPE)] == (EX + "Person", None, None)
    assert d[(a, EX + "name")] == ("Alice", None, None)
    # @vocab expansion + JSON-native typed literals
    assert d[(a, "http://vocab.org/age")] == ("30", XSD + "integer", None)
    assert d[(a, "http://vocab.org/score")] == ("1.5", XSD + "double", None)
    assert d[(a, "http://vocab.org/active")] == ("true", XSD + "boolean", None)
    # coerced @type:@id term: compact IRI and @base-relative string
    knows = {o for s, p, o, *_ in rows if p == EX + "knows"}
    assert knows == {EX + "bob", "http://base.org/rel"}
    # expanded-form literals
    assert d[(a, "http://vocab.org/note")] == ("bonjour", None, "fr")
    assert d[(a, "http://vocab.org/height")] == ("1.7", EX + "metres", None)
    # nested node object → blank node + its own triples
    pet = d[(a, "http://vocab.org/pet")][0]
    assert pet.startswith("_:")
    assert d[(pet, RDF_TYPE)] == (EX + "Cat", None, None)
    assert d[(pet, EX + "name")] == ("Tom", None, None)
    assert all(r[5] == "urn:d" for r in rows)


def test_jsonld_nested_context_extends_outer():
    """An inner @context EXTENDS the active context (JSON-LD context
    processing), so outer prefixes keep working inside the nested node;
    `null` resets it."""
    doc = ('{"@context": {"ex": "http://ex/"}, "@id": "http://a", '
           '"ex:p": {"@context": {"name": "http://n/name"}, '
           '"@id": "http://b", "ex:q": "v", "name": "bob"}}')
    rows = parse_jsonld_text(doc, None)
    got = {(s, p, o) for s, p, o, *_ in rows}
    assert got == {("http://a", "http://ex/p", "http://b"),
                   ("http://b", "http://ex/q", "v"),
                   ("http://b", "http://n/name", "bob")}
    # "@context": null resets — the outer term is gone, bare key raises
    doc2 = ('{"@context": {"ex": "http://ex/"}, "@id": "http://a", '
            '"ex:p": {"@context": null, "@id": "http://b", "ex:q": "v"}}')
    rows2 = parse_jsonld_text(doc2, None)
    # with no prefix mapping, "ex:q" is taken as an absolute IRI as-is
    assert ("http://b", "ex:q", "v") in {(s, p, o) for s, p, o, *_ in rows2}


def test_jsonld_named_graph_and_errors():
    g = ('{"@context": {"ex": "http://example.org/"}, "@id": "ex:g1", '
         '"@graph": [{"@id": "ex:a", "@type": "ex:T"}]}')
    rows = parse_jsonld_text(g, "urn:d")
    assert rows == [(EX + "a", RDF_TYPE, EX + "T", None, None, EX + "g1")]
    with pytest.raises(ValueError, match="remote/array @context"):
        parse_jsonld_text('{"@context": "http://remote/ctx", "@id": "x"}')
    with pytest.raises(ValueError, match="cannot expand property"):
        parse_jsonld_text('{"@id": "http://e/a", "bare": 1}')
    with pytest.raises(ValueError, match="unsupported JSON-LD keyword"):
        parse_jsonld_text('{"@id": "http://e/a", '
                          '"@nest": {"http://e/p": {"@id": "http://e/b"}}}')


# -------------------------------------------------------------- RDF/XML

def test_rdfxml_semantics():
    rows = parse_rdfxml_text(RDFXML, default_graph="urn:d")
    d = {(s, p): (o, dt, lang) for s, p, o, dt, lang, _ in rows}
    a = EX + "alice"
    # typed node element → rdf:type; property attribute → literal
    assert d[(a, RDF_TYPE)] == (EX + "Person", None, None)
    assert d[(a, EX + "nick")] == ("Al", None, "en")
    # inherited xml:lang on text property, overridden in nested element
    assert d[(a, EX + "name")] == ("Alice", None, "en")
    assert d[(a, EX + "age")] == ("30", XSD + "integer", None)
    assert d[(a, EX + "knows")] == (EX + "bob", None, None)
    pet = d[(a, EX + "pet")][0]
    assert d[(pet, RDF_TYPE)] == (EX + "Cat", None, None)
    assert d[(pet, EX + "name")] == ("Tom", None, "fr")
    # parseType=Resource → fresh blank with child properties
    addr = d[(a, EX + "addr")][0]
    assert addr.startswith("_:")
    assert d[(addr, EX + "city")] == ("Paris", None, "en")
    # rdf:nodeID links both directions
    assert d[(a, EX + "friend")] == ("_:b7", None, None)
    assert d[("_:b7", EX + "name")] == ("Bob", None, "en")
    assert all(r[5] == "urn:d" for r in rows)


def test_rdfxml_unsupported_parsetype_raises():
    bad = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:ex="http://e/"><rdf:Description rdf:about="http://e/a">'
           '<ex:p rdf:parseType="Bogus"/></rdf:Description></rdf:RDF>')
    with pytest.raises(ValueError, match="unsupported rdf:parseType"):
        parse_rdfxml_text(bad)


# --------------------------------------------- distributed + dispatch

def test_import_rdf_dispatch_distributed(spark, tmp_path):
    """Every whole-file format loads through import_rdf and matches its
    pure-python oracle; the N-Triples arm still takes the line path."""
    (tmp_path / "trig").mkdir()
    (tmp_path / "jsonld").mkdir()
    (tmp_path / "rdfxml").mkdir()
    (tmp_path / "nt").mkdir()
    (tmp_path / "trig" / "a.trig").write_text(TRIG)
    (tmp_path / "jsonld" / "a.jsonld").write_text(JSONLD)
    (tmp_path / "rdfxml" / "a.rdf").write_text(RDFXML)
    (tmp_path / "nt" / "a.nt").write_text(
        "<http://example.org/a> <http://example.org/b> "
        "<http://example.org/c> .\n")

    for fmt, path, oracle in [
        ("trig", tmp_path / "trig", parse_turtle_text(TRIG, "urn:d")),
        ("json-ld", tmp_path / "jsonld", parse_jsonld_text(JSONLD, "urn:d")),
        ("rdf-xml", tmp_path / "rdfxml", parse_rdfxml_text(RDFXML, "urn:d")),
    ]:
        df = import_rdf(spark, str(path), fmt=fmt, default_graph="urn:d")
        assert {tuple(r) for r in df.collect()} == set(oracle), fmt

    nt = import_rdf(spark, str(tmp_path / "nt"), fmt="ntriples")
    assert [tuple(r)[:3] for r in nt.collect()] == [
        (EX + "a", EX + "b", EX + "c")]
    with pytest.raises(ValueError, match="unsupported RDF format"):
        import_rdf(spark, str(tmp_path / "nt"), fmt="n3")


def test_formats_into_store_ops(spark, tmp_path):
    """Loaded JSON-LD flows through the same long-table store operators
    as every other source (pattern scan + serialize roundtrip)."""
    from kgraphmemory_spark.io.rdf import parse_lines, serialize_lines
    from kgraphmemory_spark.operators.store import get_triples
    (tmp_path / "a.jsonld").write_text(JSONLD)
    t = import_rdf(spark, str(tmp_path), fmt="jsonld", default_graph="urn:d")
    hits = get_triples(t, s=EX + "alice", p=EX + "name").collect()
    assert [h.object for h in hits] == ["Alice"]
    # NT-expressible subset round-trips through serialize → parse
    nt = serialize_lines(t.where("obj_lang IS NULL"), fmt="ntriples")
    back = parse_lines(nt)
    assert back.count() == t.where("obj_lang IS NULL").count()


# --------------------------------------------- round-3 ADVICE regressions

def test_jsonld_bare_type_uses_vocab_not_base():
    """@type expands with the vocabulary mapping: a bare word under both
    @vocab and @base must resolve against @vocab (JSON-LD expansion),
    never @base."""
    doc = ('{"@context": {"@vocab": "http://vocab.org/", '
           '"@base": "http://base.org/"}, '
           '"@id": "alice", "@type": "Person"}')
    rows = parse_jsonld_text(doc, "urn:d")
    assert rows == [("http://base.org/alice", RDF_TYPE,
                     "http://vocab.org/Person", None, None, "urn:d")]


def test_jsonld_bare_type_without_vocab_raises():
    with pytest.raises(ValueError, match="cannot expand @type"):
        parse_jsonld_text('{"@id": "http://e/a", "@type": "Person"}')


def test_jsonld_term_mapped_type():
    doc = ('{"@context": {"P": "http://other.org/P"}, '
           '"@id": "http://e/a", "@type": "P"}')
    rows = parse_jsonld_text(doc)
    assert rows[0][2] == "http://other.org/P"


def test_jsonld_value_object_bare_datatype_uses_vocab():
    doc = ('{"@context": {"@vocab": "http://vocab.org/", '
           '"@base": "http://base.org/"}, "@id": "http://e/a", '
           '"p": {"@value": "x", "@type": "dt"}}')
    rows = parse_jsonld_text(doc)
    assert rows == [("http://e/a", "http://vocab.org/p", "x",
                     "http://vocab.org/dt", None, None)]


def test_jsonld_nested_graph_object():
    """A graph object reached as a property value names a graph (its @id)
    holding the contained triples; the link triple stays in the enclosing
    graph."""
    doc = ('{"@context": {"ex": "http://example.org/"}, "@id": "ex:a", '
           '"ex:p": {"@id": "ex:g", "@graph": [{"@id": "ex:b", '
           '"ex:q": 1}]}}')
    rows = parse_jsonld_text(doc)
    assert (EX + "a", EX + "p", EX + "g", None, None, None) in rows
    assert (EX + "b", EX + "q", "1", XSD + "integer", None,
            EX + "g") in rows
    # holder without @id → fresh blank-node graph name
    doc2 = ('{"@context": {"ex": "http://example.org/"}, "@id": "ex:a", '
            '"ex:p": {"@graph": [{"@id": "ex:b", "ex:q": "v"}]}}')
    rows2 = parse_jsonld_text(doc2)
    g = next(r[5] for r in rows2 if r[1] == EX + "q")
    assert g.startswith("_:")
    assert (EX + "a", EX + "p", g, None, None, None) in rows2


def test_jsonld_nested_context_honored_not_skipped():
    """A nested node's own @context applies to that node instead of being
    silently ignored."""
    doc = ('{"@context": {"ex": "http://example.org/"}, "@id": "ex:a", '
           '"ex:p": {"@context": {"oth": "http://other.org/"}, '
           '"@id": "oth:b", "oth:q": "v"}}')
    rows = parse_jsonld_text(doc)
    d = {(s, p): o for s, p, o, *_ in rows}
    assert d[("http://other.org/b", "http://other.org/q")] == "v"
    assert d[(EX + "a", EX + "p")] == "http://other.org/b"


def test_import_rdf_accepts_reference_spellings(spark, tmp_path):
    """'rdf/xml' — the reference's primary RDF/XML spelling — and 'xml'
    both dispatch to the RDF/XML arm."""
    (tmp_path / "a.rdf").write_text(RDFXML)
    for fmt in ("rdf/xml", "RDF/XML", "xml", "rdf_xml"):
        df = import_rdf(spark, str(tmp_path), fmt=fmt, default_graph="urn:d")
        assert {tuple(r) for r in df.collect()} == set(
            parse_rdfxml_text(RDFXML, "urn:d")), fmt


def test_rdfxml_xml_namespace_attrs_not_junk_triples():
    """xml:space (any xml:* attr except lang/base) is skipped — never
    emitted as a property triple with a namespacebase-style predicate."""
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:ex="http://e/"><rdf:Description rdf:about="http://e/a" '
           'xml:space="preserve"><ex:p>v</ex:p></rdf:Description></rdf:RDF>')
    rows = parse_rdfxml_text(doc)
    assert rows == [("http://e/a", "http://e/p", "v", None, None, None)]


def test_rdfxml_xml_base_resolution():
    """xml:base scopes per element and resolves rdf:about / rdf:resource /
    rdf:datatype / rdf:ID (RFC 3986 via urljoin)."""
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:ex="http://e/" xml:base="http://b/dir/">'
           '<rdf:Description rdf:about="a">'
           '<ex:p rdf:resource="x"/>'
           '<ex:q rdf:datatype="dt">7</ex:q>'
           '</rdf:Description>'
           '<rdf:Description rdf:ID="frag"><ex:r>v</ex:r></rdf:Description>'
           '<rdf:Description rdf:about="c" xml:base="http://other/">'
           '<ex:s rdf:resource="#here"/></rdf:Description>'
           '</rdf:RDF>')
    d = {(s, p): (o, dt) for s, p, o, dt, *_ in parse_rdfxml_text(doc)}
    assert d[("http://b/dir/a", "http://e/p")] == ("http://b/dir/x", None)
    assert d[("http://b/dir/a", "http://e/q")] == ("7", "http://b/dir/dt")
    assert d[("http://b/dir/#frag", "http://e/r")] == ("v", None)
    # inner xml:base overrides the root's for that element's subtree
    assert d[("http://other/c", "http://e/s")] == ("http://other/#here",
                                                   None)
    # no base → rdf:ID keeps the bare-fragment form, absolute IRIs pass
    nob = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:ex="http://e/">'
           '<rdf:Description rdf:ID="f"><ex:p>v</ex:p></rdf:Description>'
           '</rdf:RDF>')
    assert parse_rdfxml_text(nob)[0][0] == "#f"


# ------------------------------------------------- round 3: JSON-LD @list

def test_jsonld_list_value_object():
    from kgraphmemory_spark.io.jsonld import RDF_FIRST, RDF_NIL, RDF_REST
    doc = ('{"@context": {"ex": "http://example.org/"}, "@id": "ex:a", '
           '"ex:l": {"@list": ["one", 2, {"@id": "ex:b"}]}}')
    rows = parse_jsonld_text(doc, "urn:d")
    spo = {(s, p): (o, dt) for s, p, o, dt, lang, g in rows}
    head = spo[(EX + "a", EX + "l")][0]
    chain, node = [], head
    while node != RDF_NIL:
        chain.append(spo[(node, RDF_FIRST)])
        node = spo[(node, RDF_REST)][0]
    assert chain == [("one", None), ("2", XSD + "integer"),
                     (EX + "b", None)]
    assert all(r[5] == "urn:d" for r in rows)


def test_jsonld_empty_list_is_nil_and_container_list():
    from kgraphmemory_spark.io.jsonld import RDF_FIRST, RDF_NIL, RDF_REST
    doc = ('{"@context": {"ex": "http://example.org/", '
           '"steps": {"@id": "http://example.org/steps", '
           '"@container": "@list"}}, '
           '"@id": "ex:a", "ex:empty": {"@list": []}, '
           '"steps": ["s1", "s2"]}')
    rows = parse_jsonld_text(doc)
    spo = {(s, p): o for s, p, o, dt, lang, g in rows}
    assert spo[(EX + "a", EX + "empty")] == RDF_NIL
    head = spo[(EX + "a", EX + "steps")]
    assert spo[(head, RDF_FIRST)] == "s1"
    second = spo[(head, RDF_REST)]
    assert spo[(second, RDF_FIRST)] == "s2"
    assert spo[(second, RDF_REST)] == RDF_NIL


def test_jsonld_list_with_extra_keys_raises():
    import pytest as _pt
    with _pt.raises(ValueError, match="@list"):
        parse_jsonld_text('{"@id": "http://e/a", '
                          '"http://e/p": {"@list": [], "@id": "http://e/x"}}')


# ----------------------- round 3: rdf:li, Collection/Literal, @reverse

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_rdfxml_li_numbering():
    """rdf:li becomes rdf:_1, rdf:_2, ... numbered per enclosing element;
    a parseType=Resource block restarts the numbering (spec §7.4)."""
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:ex="http://e/">'
           '<rdf:Seq rdf:about="http://e/seq">'
           '<rdf:li>one</rdf:li><rdf:li>two</rdf:li>'
           '<ex:other>mid</ex:other><rdf:li>three</rdf:li>'
           '<ex:blk rdf:parseType="Resource"><rdf:li>inner</rdf:li></ex:blk>'
           '</rdf:Seq></rdf:RDF>')
    rows = parse_rdfxml_text(doc)
    d = {(s, p): o for s, p, o, *_ in rows}
    seq = "http://e/seq"
    assert d[(seq, RDF_NS + "_1")] == "one"
    assert d[(seq, RDF_NS + "_2")] == "two"
    assert d[(seq, RDF_NS + "_3")] == "three"       # skips ex:other
    assert d[(seq, RDF_NS + "type")] == RDF_NS + "Seq"
    inner = d[(seq, "http://e/blk")]
    assert d[(inner, RDF_NS + "_1")] == "inner"     # restarted, not _4


def test_rdfxml_parsetype_collection():
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:ex="http://e/">'
           '<rdf:Description rdf:about="http://e/a">'
           '<ex:items rdf:parseType="Collection">'
           '<rdf:Description rdf:about="http://e/x"/>'
           '<rdf:Description rdf:about="http://e/y"/>'
           '</ex:items>'
           '<ex:none rdf:parseType="Collection"/>'
           '</rdf:Description></rdf:RDF>')
    rows = parse_rdfxml_text(doc)
    d = {(s, p): o for s, p, o, *_ in rows}
    head = d[("http://e/a", "http://e/items")]
    assert d[(head, RDF_NS + "first")] == "http://e/x"
    cell2 = d[(head, RDF_NS + "rest")]
    assert d[(cell2, RDF_NS + "first")] == "http://e/y"
    assert d[(cell2, RDF_NS + "rest")] == RDF_NS + "nil"
    assert d[("http://e/a", "http://e/none")] == RDF_NS + "nil"


def test_rdfxml_parsetype_literal():
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
           'xmlns:ex="http://e/">'
           '<rdf:Description rdf:about="http://e/a">'
           '<ex:html rdf:parseType="Literal">pre<b>bold</b>post</ex:html>'
           '</rdf:Description></rdf:RDF>')
    (s, p, o, dt, lang, g), = parse_rdfxml_text(doc)
    assert (s, p) == ("http://e/a", "http://e/html")
    assert o == "pre<b>bold</b>post"
    assert dt == RDF_NS + "XMLLiteral" and lang is None


def test_jsonld_reverse_keyword():
    """The @reverse node-object keyword flips subject/object."""
    doc = ('{"@context": {"ex": "http://example.org/"}, "@id": "ex:alice", '
           '"@reverse": {"ex:childOf": [{"@id": "ex:bob"}, "ex:carol"]}}')
    rows = parse_jsonld_text(doc)
    assert (EX + "bob", EX + "childOf", EX + "alice",
            None, None, None) in rows
    assert (EX + "carol", EX + "childOf", EX + "alice",
            None, None, None) in rows


def test_jsonld_reverse_term():
    """A context term defined with {"@reverse": iri} flips direction when
    used in normal property position, and its nested node objects still
    emit their own triples."""
    doc = ('{"@context": {"ex": "http://example.org/", '
           '"children": {"@reverse": "ex:childOf"}}, '
           '"@id": "ex:alice", '
           '"children": {"@id": "ex:bob", "ex:name": "Bob"}}')
    rows = parse_jsonld_text(doc)
    assert (EX + "bob", EX + "childOf", EX + "alice",
            None, None, None) in rows
    assert (EX + "bob", EX + "name", "Bob", None, None, None) in rows


def test_jsonld_reverse_literal_raises():
    doc = ('{"@context": {"ex": "http://example.org/"}, "@id": "ex:a", '
           '"@reverse": {"ex:p": {"@value": "lit"}}}')
    with pytest.raises(ValueError, match="node references"):
        parse_jsonld_text(doc)
    doc2 = ('{"@context": {"ex": "http://example.org/"}, "@id": "ex:a", '
            '"@reverse": {"ex:p": 5}}')
    with pytest.raises(ValueError, match="node references"):
        parse_jsonld_text(doc2)


def test_jsonld_reverse_only_term_misuse_raises():
    """A reverse-only term ({'@reverse': iri}, no @id) used as a compact
    IRI prefix or @type value raises a clear ValueError instead of an
    executor KeyError."""
    with pytest.raises(ValueError, match="reverse-only"):
        parse_jsonld_text(
            '{"@context": {"p": {"@reverse": "http://x/rel"}}, '
            '"@id": "p:a", "http://x/q": "v"}')
    with pytest.raises(ValueError, match="reverse-only"):
        parse_jsonld_text(
            '{"@context": {"p": {"@reverse": "http://x/rel"}}, '
            '"@id": "http://y/a", "@type": "p"}')


def test_file_scoped_blank_nodes(spark, tmp_path):
    """r3 VERDICT item 5: two files both using _:b1 must NOT merge those
    nodes on a multi-file load (pyoxigraph scopes bnodes per parse call,
    kgraph_rdf_db.py:410-427); a single-file load keeps labels verbatim."""
    from kgraphmemory_spark.io.rdf import load_ntriples
    from kgraphmemory_spark.io.turtle import load_turtle
    # -- N-Triples ----------------------------------------------------
    d = tmp_path / "nt"
    d.mkdir()
    (d / "a.nt").write_text('_:b1 <http://p> "from-a" .\n')
    (d / "b.nt").write_text('_:b1 <http://p> "from-b" .\n')
    rows = load_ntriples(spark, str(d)).collect()
    subs = {r.subject for r in rows}
    assert len(subs) == 2 and all(s.startswith("_:b1--f") for s in subs)
    # single file: verbatim
    one = load_ntriples(spark, str(d / "a.nt")).collect()
    assert [r.subject for r in one] == ["_:b1"]
    # -- Turtle (covers the shared wholefile loader: trig/jsonld/rdfxml)
    t = tmp_path / "ttl"
    t.mkdir()
    (t / "a.ttl").write_text(
        '@prefix ex: <http://e/> .\n_:b1 ex:p "A" ; ex:friend _:b2 .\n')
    (t / "b.ttl").write_text(
        '@prefix ex: <http://e/> .\n_:b1 ex:p "B" .\n')
    rows = load_turtle(spark, str(t)).collect()
    subs = {r.subject for r in rows if r.object in ("A", "B")}
    assert len(subs) == 2
    # intra-file bnode links stay consistent: _:b1's friend object carries
    # the SAME suffix as its subject
    friend = [r for r in rows if r.predicate == "http://e/friend"][0]
    assert friend.subject.split("--f")[1] == friend.object.split("--f")[1]
    one = load_turtle(spark, str(t / "a.ttl")).collect()
    assert {r.subject for r in one} == {"_:b1"}
