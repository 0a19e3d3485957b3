"""Property-based round-trips for the whole-file RDF parsers
(hypothesis over the pure-python parse functions, which are also the
distributed paths' per-file kernels — io/turtle.py, io/jsonld.py,
io/rdfxml.py share them verbatim via mapInPandas).

Strategy: generate arbitrary terms/literals, serialize them with an
independent escaper written here (NT escaping rules / json.dumps /
xml.sax.saxutils), parse, and demand the exact triple back.  This
hammers the tokenizers and unescape paths with unicode the hand-written
fixtures never cover.
"""

import json
from xml.sax.saxutils import escape as xml_escape
from xml.sax.saxutils import quoteattr

from hypothesis import given, settings
from hypothesis import strategies as st

from kgraphmemory_spark.io.jsonld import parse_jsonld_text
from kgraphmemory_spark.io.rdfxml import parse_rdfxml_text
from kgraphmemory_spark.io.turtle import XSD, parse_turtle_text

# Any unicode except the surrogate range (not encodable to UTF-8) and
# the C0/C1 controls XML cannot represent (keep \t \n \r which NT
# escapes and XML allows).
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),
        blacklist_characters="".join(
            chr(c) for c in range(0x20) if c not in (0x09, 0x0A, 0x0D))),
    max_size=60)

# IRI-safe local names / lang tags
_local = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1,
                 max_size=10)
_lang = st.sampled_from(["en", "fr", "en-US", "de-AT", "zh"])


def _nt_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
             .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t"))


@settings(max_examples=200, deadline=None)
@given(subj=_local, pred=_local, lit=_text,
       tag=st.one_of(st.none(), _lang,
                     _local.map(lambda x: "http://dt/" + x)))
def test_turtle_roundtrips_arbitrary_nt_literal(subj, pred, lit, tag):
    """N-Triples output is valid Turtle; an arbitrarily-escaped literal
    (any unicode, any lang/datatype) survives parse exactly."""
    s, p = f"http://s/{subj}", f"http://p/{pred}"
    o = f'"{_nt_escape(lit)}"'
    if tag is None:
        dt = lang = None
    elif tag.startswith("http://"):
        o += f"^^<{tag}>"
        dt, lang = tag, None
    else:
        o += f"@{tag}"
        dt, lang = None, tag
    rows = parse_turtle_text(f"<{s}> <{p}> {o} .")
    assert rows == [(s, p, lit, dt, lang, None)]


@settings(max_examples=200, deadline=None)
@given(lit=_text, quote=st.sampled_from(['"""', "'''"]))
def test_turtle_long_literal_roundtrip(lit, quote):
    """Long-quoted literals carry raw newlines/quotes; only the quote
    char itself and backslashes need escaping."""
    body = lit.replace("\\", "\\\\").replace(quote[0], "\\" + quote[0])
    rows = parse_turtle_text(f"<http://s/a> <http://p/b> {quote}{body}{quote} .")
    assert rows == [("http://s/a", "http://p/b", lit, None, None, None)]


@settings(max_examples=150, deadline=None)
@given(lit=_text,
       val=st.one_of(st.integers(min_value=-10**12, max_value=10**12),
                     st.booleans(),
                     st.floats(allow_nan=False, allow_infinity=False)))
def test_jsonld_literal_roundtrip(lit, val):
    """json.dumps-escaped strings and JSON-native typed values survive
    parse with the implied xsd datatypes."""
    doc = json.dumps({
        "@context": {"@vocab": "http://v/"},
        "@id": "http://s/a", "txt": lit, "num": val})
    d = {(s, p): (o, dt) for s, p, o, dt, _, _ in parse_jsonld_text(doc)}
    assert d[("http://s/a", "http://v/txt")] == (lit, None)
    o, dt = d[("http://s/a", "http://v/num")]
    if isinstance(val, bool):
        assert (o, dt) == ("true" if val else "false", XSD + "boolean")
    elif isinstance(val, int):
        assert (o, dt) == (str(val), XSD + "integer")
    else:
        assert (o, dt) == (repr(val), XSD + "double")


@settings(max_examples=150, deadline=None)
@given(lit=_text, attr=_text, lang=st.one_of(st.none(), _lang))
def test_rdfxml_literal_roundtrip(lit, attr, lang):
    """XML-escaped text content and property attributes survive parse;
    xml:lang inherits onto both."""
    lang_attr = f' xml:lang="{lang}"' if lang else ""
    doc = (f'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
           f' xmlns:ex="http://e/"{lang_attr}>'
           f'<rdf:Description rdf:about="http://e/a" ex:attr={quoteattr(attr)}>'
           f'<ex:p>{xml_escape(lit).replace(chr(13), "&#13;")}</ex:p>'
           f'</rdf:Description></rdf:RDF>')
    d = {(s, p): (o, lg) for s, p, o, _, lg, _ in parse_rdfxml_text(doc)}
    assert d[("http://e/a", "http://e/p")] == (lit, lang)
    assert d[("http://e/a", "http://e/attr")] == (attr, lang)


@settings(max_examples=100, deadline=None)
@given(items=st.lists(st.integers(min_value=0, max_value=99), max_size=6))
def test_turtle_collection_preserves_order(items):
    """A generated (...) collection desugars to a first/rest chain that
    walks back to the original sequence."""
    doc = ("<http://s/a> <http://p/list> ( "
           + " ".join(str(i) for i in items) + " ) .")
    rows = parse_turtle_text(doc)
    by_subj = {}
    for s, p, o, *_ in rows:
        by_subj.setdefault(s, {})[p] = o
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    head = by_subj["http://s/a"]["http://p/list"]
    out = []
    while head != rdf + "nil":
        cell = by_subj[head]
        out.append(int(cell[rdf + "first"]))
        head = cell[rdf + "rest"]
    assert out == items
