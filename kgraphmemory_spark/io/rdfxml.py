"""RDF/XML (subset) whole-file parser — with turtle.py and jsonld.py this
closes S20's format list (SURVEY.md §2.1; the reference delegates
``fmt="rdf-xml"`` to pyoxigraph, kgraph_rdf_db.py:493-511, which this
sandbox does not ship).  Built on stdlib ``xml.etree`` — no new deps.

Supported subset — the striped-syntax profile that covers typical
exported RDF/XML:
- root ``rdf:RDF`` (or a single node element);
- node elements: ``rdf:Description`` or a typed element (its expanded
  QName becomes an ``rdf:type`` triple), subject from ``rdf:about`` /
  ``rdf:ID`` (→ ``base#ID``-style, emitted as ``#ID`` when no xml:base) /
  ``rdf:nodeID`` (→ ``_:id``) / fresh blank node when absent;
- property elements: expanded child QName is the predicate; object from
  ``rdf:resource`` (IRI), ``rdf:nodeID`` (blank), nested node element(s),
  ``rdf:parseType="Resource"`` (children become properties of a fresh
  blank node), or text content with optional ``rdf:datatype`` /
  inherited ``xml:lang``;
- non-rdf attributes on a node element are emitted as plain-literal
  property triples (the RDF/XML "property attributes" abbreviation).

NOT supported (documented limitation): ``rdf:li`` / container
numbering, ``rdf:parseType="Collection"`` / ``"Literal"``,
``rdf:bagID``, reification attributes, ``xml:base`` resolution.

Scale shape: same as turtle.py — XML is not splittable, so parallelism
is one task per file via wholetext + Arrow-batched mapInPandas.
Blank-node labels (``_:x<n>``) are document-scoped.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
XML_NS = "http://www.w3.org/XML/1998/namespace"

_ABOUT = f"{{{RDF_NS}}}about"
_ID = f"{{{RDF_NS}}}ID"
_NODEID = f"{{{RDF_NS}}}nodeID"
_RESOURCE = f"{{{RDF_NS}}}resource"
_DATATYPE = f"{{{RDF_NS}}}datatype"
_PARSETYPE = f"{{{RDF_NS}}}parseType"
_LANG = f"{{{XML_NS}}}lang"
_DESCRIPTION = f"{{{RDF_NS}}}Description"
_RDF_ROOT = f"{{{RDF_NS}}}RDF"


def _expand(tag: str) -> str:
    """etree's ``{ns}local`` → ``nslocal`` (RDF QName concatenation)."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


class _Parser:
    def __init__(self, default_graph: str | None):
        self.rows: list[tuple] = []
        self.graph = default_graph
        self._bn = 0

    def _blank(self) -> str:
        self._bn += 1
        return f"_:x{self._bn}"

    def parse(self, text: str) -> list[tuple]:
        root = ET.fromstring(text)
        if root.tag == _RDF_ROOT:
            lang = root.get(_LANG)
            for child in root:
                self._node(child, lang)
        else:
            self._node(root, None)
        return self.rows

    def _subject_of(self, el: ET.Element) -> str:
        if _ABOUT in el.attrib:
            return el.get(_ABOUT)
        if _ID in el.attrib:
            return "#" + el.get(_ID)
        if _NODEID in el.attrib:
            return "_:" + el.get(_NODEID)
        return self._blank()

    def _node(self, el: ET.Element, lang: str | None) -> str:
        subj = self._subject_of(el)
        lang = el.get(_LANG, lang)
        emit = self.rows.append
        if el.tag != _DESCRIPTION:
            emit((subj, RDF_TYPE, _expand(el.tag), None, None, self.graph))
        for attr, val in el.attrib.items():
            if attr in (_ABOUT, _ID, _NODEID, _LANG):
                continue
            if attr.startswith(f"{{{XML_NS}}}"):
                # xml:base / xml:space / any other xml:-namespace attribute
                # is syntax metadata, never a property — emitting it as a
                # triple (predicate "http://...namespacebase") would be
                # junk data.  xml:base is a documented unsupported feature,
                # so it raises; the rest are skipped.
                if attr == f"{{{XML_NS}}}base":
                    raise ValueError(
                        "xml:base resolution is outside the supported "
                        "subset (documented limitation)")
                continue
            if attr.startswith(f"{{{RDF_NS}}}"):
                raise ValueError(f"unsupported rdf: attribute "
                                 f"{_expand(attr)!r} on a node element")
            # property-attribute abbreviation → plain literal
            emit((subj, _expand(attr), val, None, lang, self.graph))
        for prop in el:
            self._property(subj, prop, lang)
        return subj

    def _property(self, subj: str, prop: ET.Element,
                  lang: str | None) -> None:
        pred = _expand(prop.tag)
        lang = prop.get(_LANG, lang)
        emit = self.rows.append
        if _RESOURCE in prop.attrib:
            emit((subj, pred, prop.get(_RESOURCE), None, None, self.graph))
            return
        if _NODEID in prop.attrib:
            emit((subj, pred, "_:" + prop.get(_NODEID),
                  None, None, self.graph))
            return
        pt = prop.get(_PARSETYPE)
        if pt is not None:
            if pt != "Resource":
                raise ValueError(f"unsupported rdf:parseType={pt!r}")
            inner = self._blank()
            emit((subj, pred, inner, None, None, self.graph))
            for p in prop:
                self._property(inner, p, lang)
            return
        children = list(prop)
        if children:
            for child in children:
                obj = self._node(child, lang)
                emit((subj, pred, obj, None, None, self.graph))
            return
        dt = prop.get(_DATATYPE)
        text = prop.text or ""
        emit((subj, pred, text, dt, None if dt else lang, self.graph))


def parse_rdfxml_text(text: str,
                      default_graph: str | None = None) -> list[tuple]:
    """Pure-python single-document parse → [(subject, predicate, object,
    obj_datatype, obj_lang, graph)] — also the oracle for the Spark path."""
    return _Parser(default_graph).parse(text)


def load_rdfxml(spark: SparkSession, path: str,
                default_graph: str | None = None) -> DataFrame:
    """Distributed RDF/XML load: one task per file (wholetext scan),
    Arrow-batched parse via mapInPandas; schema identical to
    io.rdf.parse_lines so every downstream store operator applies."""
    from .turtle import _wholefile_loader
    return _wholefile_loader(spark, path, parse_rdfxml_text, default_graph)
