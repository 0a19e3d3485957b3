"""JSON-LD (subset) whole-file parser — with turtle.py and rdfxml.py this
closes S20's format list (SURVEY.md §2.1; the reference delegates
``fmt="json-ld"`` to pyoxigraph, kgraph_rdf_db.py:493-511, which this
sandbox does not ship).

Supported subset — expanded and simply-compacted documents:
- ``@context``: term → IRI string, term → ``{"@id": iri, "@type":
  "@id" | <datatype-iri>}``, plus ``@vocab`` and ``@base``;
- node objects: ``@id`` (relative resolved against ``@base``; absent →
  fresh blank node), ``@type`` (string or list) → ``rdf:type`` triples;
- values: JSON string → plain literal (or IRI under a term coerced
  ``"@type": "@id"``), int → xsd:integer, float → xsd:double, bool →
  xsd:boolean, ``{"@value": …, "@type"/"@language": …}`` expanded-form
  literals, ``{"@id": …}`` IRI objects, nested node objects (emitted
  recursively, linked by their id), and JSON arrays of any of these;
- ``@graph``: a top-level or node-level graph container; when the holder
  has an ``@id`` the contained triples land in that named graph,
  otherwise in ``default_graph``.

``@list`` value objects and ``"@container": "@list"``-coerced terms
desugar to rdf:first/rdf:rest chains (``[]`` → rdf:nil), same as the
Turtle parser's collections; nested lists recurse.

``@reverse`` is supported in both forms — the node-object keyword
(``"@reverse": {prop: refs}``) and reverse terms (``{"term":
{"@reverse": iri}}``) — emitting the flipped ``(ref, prop, node)``
triple; values must be node references (a literal there raises, per the
JSON-LD spec).  Graph objects nested inside node objects work too: a
node carrying ``@graph`` names a graph (its ``@id``, or a fresh blank
node when absent) holding the contained triples, while the holder's own
properties stay in the enclosing graph.

NOT supported (documented limitation): non-@list ``@container``
semantics beyond the default multi-valued arrays (which is exactly
``@set``), ``@nest``, ``@included``, remote contexts (a string
``@context`` raises — fetching URLs from executors is not a thing this
engine does), and ``@json`` literals.  ``@type`` values expand with
the vocabulary mapping (term → compact IRI → ``@vocab``), never against
``@base``; a bare ``@type`` word with no term/prefix/``@vocab`` raises.

Scale shape: same as turtle.py — JSON documents are not splittable, so
parallelism is one task per file via wholetext + Arrow-batched
mapInPandas.  Blank-node labels (``_:j<n>``) are document-scoped.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
XSD = "http://www.w3.org/2001/XMLSchema#"

_KEYWORDS = {"@id", "@type", "@value", "@language", "@context", "@graph",
             "@base", "@vocab"}


class _Ctx:
    def __init__(self, raw: dict | None):
        raw = raw or {}
        if not isinstance(raw, dict):
            raise ValueError(
                "remote/array @context is outside the supported subset")
        self.base = raw.get("@base", "") or ""
        self.vocab = raw.get("@vocab", "") or ""
        self.terms: dict[str, dict] = {}
        for term, defn in raw.items():
            if term.startswith("@"):
                continue
            if isinstance(defn, str):
                self.terms[term] = {"@id": defn}
            elif isinstance(defn, dict) and ("@id" in defn
                                             or "@reverse" in defn):
                self.terms[term] = defn
            else:
                raise ValueError(f"unsupported @context entry {term!r}")

    def derived(self, raw) -> "_Ctx":
        """An inner ``@context`` EXTENDS the active one (JSON-LD context
        processing applies definitions in order, later overriding
        earlier — it never discards outer terms); ``null`` resets to the
        empty context, per spec."""
        if raw is None:
            return _Ctx(None)
        child = _Ctx(raw)
        merged = _Ctx(None)
        merged.base = child.base if "@base" in raw else self.base
        merged.vocab = child.vocab if "@vocab" in raw else self.vocab
        merged.terms = {**self.terms, **child.terms}
        return merged

    def _expand_ref(self, name: str) -> str:
        """Expand a term / compact IRI / relative IRI used in IRI position."""
        if name in self.terms and "@id" in self.terms[name]:
            return self.terms[name]["@id"]
        if ":" in name:
            pfx, local = name.split(":", 1)
            if pfx in self.terms and not local.startswith("//"):
                if "@id" not in self.terms[pfx]:
                    raise ValueError(
                        f"term {pfx!r} is reverse-only (no @id) and "
                        "cannot be used as a compact-IRI prefix")
                return self.terms[pfx]["@id"] + local
            return name                      # already an absolute IRI
        if self.base:
            return self.base + name
        return name

    def expand_prop(self, name: str) -> tuple[str, dict]:
        """→ (predicate IRI, term definition) for a node-object key.
        A reverse term (``{"@reverse": iri}``) expands to that IRI; the
        caller flips subject/object when ``"@reverse" in defn``."""
        defn = self.terms.get(name, {})
        if "@reverse" in defn:
            iri = self._expand_ref(defn["@reverse"])
        elif name in self.terms:
            iri = self._expand_ref(defn["@id"])
        elif ":" in name:
            iri = self._expand_ref(name)
        elif self.vocab:
            iri = self.vocab + name
        else:
            raise ValueError(f"cannot expand property {name!r}: "
                             "no term, prefix, or @vocab")
        return iri, defn

    def expand_type(self, name: str) -> str:
        """Expand an ``@type`` value.  Per JSON-LD expansion, @type uses
        the *vocabulary* mapping (term → compact IRI → @vocab), NOT the
        @base fallback that applies to @id-position references — a bare
        word under ``{"@vocab": V, "@base": B}`` must become V+word, never
        B+word.  A bare word with no term/prefix/@vocab raises, matching
        the module's raise-on-unsupported posture."""
        if name in self.terms:
            if "@id" not in self.terms[name]:
                raise ValueError(
                    f"term {name!r} is reverse-only (no @id) and cannot "
                    "be an @type value")
            return self._expand_ref(self.terms[name]["@id"])
        if ":" in name:
            return self._expand_ref(name)
        if self.vocab:
            return self.vocab + name
        raise ValueError(f"cannot expand @type {name!r}: "
                         "no term, prefix, or @vocab")


class _Parser:
    def __init__(self, default_graph: str | None):
        self.rows: list[tuple] = []
        self.default_graph = default_graph
        self._bn = 0

    def _blank(self) -> str:
        self._bn += 1
        return f"_:j{self._bn}"

    def parse(self, doc, ctx: _Ctx | None = None,
              graph: str | None = None) -> None:
        graph = graph if graph is not None else self.default_graph
        if isinstance(doc, list):
            for node in doc:
                self.parse(node, ctx, graph)
            return
        if not isinstance(doc, dict):
            raise ValueError(f"top-level JSON-LD value must be an object "
                             f"or array, got {type(doc).__name__}")
        if "@context" in doc:
            ctx = (ctx or _Ctx(None)).derived(doc["@context"])
        ctx = ctx or _Ctx(None)
        if "@graph" in doc:
            g = ctx._expand_ref(doc["@id"]) if "@id" in doc else graph
            self.parse(doc["@graph"], ctx, g)
            # a graph holder may also carry its own properties
            rest = {k: v for k, v in doc.items()
                    if k not in ("@graph", "@context")}
            if set(rest) - {"@id"}:
                self._node(rest, ctx, graph)
            return
        self._node(doc, ctx, graph)

    def _node(self, node: dict, ctx: _Ctx, graph: str | None) -> str:
        # Nested nodes may carry their own @context, which extends the
        # active one (idempotent for the top-level doc, whose context
        # parse() already applied: re-deriving X over X is X).
        if "@context" in node:
            ctx = ctx.derived(node["@context"])
        subj = (ctx._expand_ref(node["@id"]) if "@id" in node
                else self._blank())
        if "@graph" in node:
            # Graph object reached as a value: the node names a graph and
            # its @graph contents land there (JSON-LD deserialization to
            # an RDF dataset; a holder without @id names a fresh
            # blank-node graph).  The holder's own properties stay in the
            # *enclosing* graph, same as parse()'s top-level handling.
            self.parse(node["@graph"], ctx, subj)
        for t in (lambda ts: ts if isinstance(ts, list) else [ts])(
                node.get("@type", [])):
            self.rows.append((subj, RDF_TYPE, ctx.expand_type(t),
                              None, None, graph))
        if "@reverse" in node:
            rev = node["@reverse"]
            if not isinstance(rev, dict):
                raise ValueError("@reverse must hold an object mapping "
                                 "properties to node references")
            for key, value in rev.items():
                pred, defn = ctx.expand_prop(key)
                if "@reverse" in defn:
                    raise ValueError(f"reverse term {key!r} inside @reverse "
                                     "(double reversal) is not supported")
                values = value if isinstance(value, list) else [value]
                for v in values:
                    self._reverse_value(subj, pred, v, ctx, graph)
        for key, value in node.items():
            if key == "@reverse" or key in _KEYWORDS:
                continue
            if key.startswith("@"):
                raise ValueError(f"unsupported JSON-LD keyword {key!r}")
            pred, defn = ctx.expand_prop(key)
            if "@reverse" in defn:
                # reverse term in a normal property position: values are
                # node references that point BACK at this node
                values = value if isinstance(value, list) else [value]
                for v in values:
                    self._reverse_value(subj, pred, v, ctx, graph)
                continue
            if defn.get("@container") == "@list" and isinstance(value, list):
                # list-coerced term: the ARRAY is ordered — one rdf list
                head = self._list_chain(value, defn, ctx, graph)
                self.rows.append((subj, pred, head, None, None, graph))
                continue
            values = value if isinstance(value, list) else [value]
            for v in values:
                self._value(subj, pred, defn, v, ctx, graph)
        return subj

    def _reverse_value(self, subj: str, pred: str, v, ctx: _Ctx,
                       graph: str | None) -> None:
        """Emit ``(v, pred, subj)`` — the flipped direction shared by the
        ``@reverse`` keyword and reverse terms.  Values must be node
        references (a literal under @reverse is invalid JSON-LD)."""
        if isinstance(v, dict):
            if "@value" in v or "@list" in v:
                raise ValueError("@reverse values must be node references, "
                                 "not literals or lists")
            obj = self._node(v, ctx, graph)
        elif isinstance(v, str):
            obj = ctx._expand_ref(v)
        else:
            raise ValueError("@reverse values must be node references, "
                             f"got {v!r}")
        self.rows.append((obj, pred, subj, None, None, graph))

    def _list_chain(self, items: list, defn: dict, ctx: _Ctx,
                    graph: str | None) -> str:
        """``@list`` → rdf:first/rdf:rest chain (same desugaring as the
        Turtle parser's ``(...)`` collections); ``[]`` → rdf:nil.
        Elements recurse through ``_value`` so nested nodes / typed values
        / nested lists all work."""
        if not items:
            return RDF_NIL
        cells = [self._blank() for _ in items]
        for i, (cell, item) in enumerate(zip(cells, items)):
            rest = cells[i + 1] if i + 1 < len(cells) else RDF_NIL
            self._value(cell, RDF_FIRST, defn, item, ctx, graph)
            self.rows.append((cell, RDF_REST, rest, None, None, graph))
        return cells[0]

    def _value(self, subj: str, pred: str, defn: dict, v,
               ctx: _Ctx, graph: str | None) -> None:
        emit = self.rows.append
        if isinstance(v, dict):
            if "@list" in v:
                if set(v) - {"@list"}:
                    raise ValueError("a @list object may not carry other "
                                     "keys in the supported subset")
                head = self._list_chain(v["@list"], defn, ctx, graph)
                emit((subj, pred, head, None, None, graph))
                return
            if "@value" in v:
                dt = v.get("@type")
                emit((subj, pred, _lexical(v["@value"]),
                      ctx.expand_type(dt) if dt else _implied_dt(v["@value"]),
                      v.get("@language"), graph))
            elif set(v) == {"@id"}:
                emit((subj, pred, ctx._expand_ref(v["@id"]),
                      None, None, graph))
            else:                            # nested node object
                obj = self._node(v, ctx, graph)
                emit((subj, pred, obj, None, None, graph))
        elif isinstance(v, bool):
            emit((subj, pred, "true" if v else "false",
                  XSD + "boolean", None, graph))
        elif isinstance(v, int):
            emit((subj, pred, str(v), XSD + "integer", None, graph))
        elif isinstance(v, float):
            emit((subj, pred, repr(v), XSD + "double", None, graph))
        elif isinstance(v, str):
            if defn.get("@type") == "@id":
                emit((subj, pred, ctx._expand_ref(v), None, None, graph))
            else:
                dt = defn.get("@type")
                emit((subj, pred, v, ctx.expand_type(dt) if dt else None,
                      None, graph))
        elif v is None:
            pass                             # JSON null drops the value
        else:
            raise ValueError(f"unsupported JSON-LD value {v!r}")


def _lexical(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _implied_dt(v) -> str | None:
    if isinstance(v, bool):
        return XSD + "boolean"
    if isinstance(v, int):
        return XSD + "integer"
    if isinstance(v, float):
        return XSD + "double"
    return None


def parse_jsonld_text(text: str,
                      default_graph: str | None = None) -> list[tuple]:
    """Pure-python single-document parse → [(subject, predicate, object,
    obj_datatype, obj_lang, graph)] — also the oracle for the Spark path."""
    p = _Parser(default_graph)
    p.parse(json.loads(text))
    return p.rows


def load_jsonld(spark: SparkSession, path: str,
                default_graph: str | None = None) -> DataFrame:
    """Distributed JSON-LD load: one task per file (wholetext scan),
    Arrow-batched parse via mapInPandas; schema identical to
    io.rdf.parse_lines so every downstream store operator applies."""
    from .turtle import _wholefile_loader
    return _wholefile_loader(spark, path, parse_jsonld_text, default_graph)
