"""SPARQL front-end: the reference's query strings, compiled to
DataFrame plans.

The reference executes raw SPARQL through pyoxigraph —
``sparql_query`` / ``sparql_construct`` / ``sparql_ask``
(kgraph.py:185-222, kgraph_rdf_db.py:238-340) — and every query its
docs and test suites actually run (docs/sparql-examples.md, the WordNet
battery test_scripts/wordnet_batch_load_test.py:95-313, the interaction
tests) uses the fragment implemented here:

- prologue ``PREFIX``; ``SELECT [DISTINCT]`` with plain variables,
  ``*``, and ``(expr AS ?v)`` projections; aggregates ``COUNT(*)``,
  ``COUNT([DISTINCT] ?v)``, ``SUM/MIN/MAX/AVG(?v)``,
  ``GROUP_CONCAT(?v [; SEPARATOR "s"])``, ``SAMPLE(?v)``
  (deterministic: the lexical minimum);
- property paths (SPARQL 1.1 §9): sequence ``p1/p2`` (pairwise join),
  alternative ``p1|p2`` (union), inverse ``^p`` (swap), grouping
  ``(...)``, negated property sets ``!iri`` / ``!(iri|^iri|...)``
  (predicate NOT-IN scan per arm), and ``p?`` / ``p+`` / ``p*`` — the
  closures evaluate as a
  distributed frontier-expansion transitive closure (per-round
  localCheckpoint, O(diameter) rounds, work O(|closure|)); zero-length
  arms range over all terms of the (graph-restricted) store per spec;
- group graph patterns: basic triple patterns (``;`` / ``,``
  abbreviations, ``a``), ``OPTIONAL { }``, ``{ } UNION { }``,
  ``MINUS { }`` (anti-join on the shared variables; removes nothing
  when the domains are disjoint, per spec), ``VALUES`` inline data
  (ground terms; compiled to a broadcast join), ``FILTER(expr)``,
  ``BIND(expr AS ?v)``, ``GRAPH <g>/?g { }``, nested groups;
- filter/bind expressions: comparisons (numeric literals compare
  numerically via try_cast, ISO dateTime strings lexically — the
  store's canonical form), ``&& || !``, ``IN``, ``CONTAINS``,
  ``STRSTARTS``, ``STRENDS``, ``STRLEN``, ``LCASE``, ``UCASE``,
  ``STR``, ``CONCAT``, ``COALESCE``, ``SUBSTR``, ``REPLACE``,
  ``STRBEFORE``/``STRAFTER`` (literal separators), ``ABS``/``ROUND``/
  ``CEIL``/``FLOOR``, ``REGEX``, ``BOUND``, ``IF``,
  ``MD5``/``SHA1``/``SHA256``/``SHA384``/``SHA512`` (UTF-8 lexical
  form, lowercase hex), ``ENCODE_FOR_URI``, dateTime components
  ``YEAR``/``MONTH``/``DAY``/``HOURS``/``MINUTES``/``SECONDS``/``TZ``
  (lexical extraction from the canonical ISO form — never routed
  through the session timezone), term introspection ``LANG``,
  ``DATATYPE``, ``isIRI``/``isURI``, ``isLITERAL``, ``isBLANK``,
  ``LANGMATCHES`` (RFC 4647 basic filtering) — compiled against hidden
  metadata sidecar columns projected ONLY for the variables a query
  introspects, so other plans are untouched — term constructors
  ``IRI``/``URI``, ``STRLANG``, ``STRDT`` (value =
  lexical form; the constructed metadata materializes through an
  introspected ``BIND`` target),
  ``EXISTS { }`` / ``NOT EXISTS { }``;
- solution modifiers ``GROUP BY``, ``HAVING`` (aggregates hoisted into
  hidden post-agg columns), ``ORDER BY [ASC|DESC]``, ``LIMIT``,
  ``OFFSET``; query forms ``SELECT``, ``ASK``, ``CONSTRUCT``
  (incl. the ``CONSTRUCT WHERE { BGP }`` shorthand, §10.2.3),
  ``DESCRIBE`` (subject-scoped description; IRIs, variables or ``*``,
  WHERE optional for ground IRIs);
- subqueries ``{ SELECT ... }`` (SPARQL 1.1 §12): evaluated as an
  independent plan (aggregates/modifiers included), joined to the
  enclosing group on the projected variables.

Compilation is Spark-first: each triple pattern is a filtered scan of
the triples table projected to its variable columns; shared variables
become equi-join keys; OPTIONAL is a left join, UNION a unionByName,
EXISTS a semi/anti join — the whole query is ONE declarative plan that
Catalyst reorders/broadcasts and AQE re-plans at runtime, never a
pattern-at-a-time loop (the reference evaluates object-at-a-time inside
pyoxigraph's single process).  A 12-pattern BGP like the WordNet
CONSTRUCT compiles to an 11-join tree over one scanned relation —
exactly the shape Spark's optimizer is built for.

Documented deviations (all on the engine's string data model):
- ``GROUP_CONCAT`` sorts its inputs (deterministic distributed order);
- ``MIN``/``MAX`` return the winning term's lexical form — ordered
  numerically when every non-null input casts to a number, else
  lexically (covers the store's ISO dateTimes); ``SUM``/``AVG`` follow
  the spec's error propagation — any bound non-numeric input makes the
  group's aggregate unbound (unbound inputs are skipped, not errored);
- an UPDATE template variable in object position carries a *lexical
  form*: DELETE matches it against any datatype/lang, INSERT writes a
  plain (untyped) literal;
- joins are on string equality, so an UNBOUND (NULL) shared variable
  never matches — spec "compatibility" treats unbound as compatible
  with anything.  Reachable only when a variable bound in just one
  UNION arm (or inside OPTIONAL) is re-used as a join key afterwards;
  the same trade-off most SPARQL-on-SQL engines make to keep joins
  hash-joinable;
- a typed object literal matches on lexical form, plus datatype when
  the table carries ``obj_datatype``;
- term introspection reads the store's metadata columns
  (``obj_datatype`` / ``obj_lang`` / ``obj_is_uri``; the last falls
  back to the engine-wide IRI shape heuristic): a variable bound only
  where no metadata exists (property-path objects, VALUES rows,
  BIND/subquery results) is treated as a simple literal, and when a
  variable is bound in several positions the first binding's metadata
  wins (joins coalesce left-first);
- ``CONSTRUCT`` returns the deduplicated triple set (a graph is a set);
- ``SPARQL UPDATE`` (``INSERT DATA`` / ``DELETE DATA`` /
  ``DELETE WHERE`` / ``[WITH <g>] DELETE {} INSERT {} WHERE {}`` and
  the graph-management forms ``CLEAR`` / ``DROP`` / ``CREATE`` /
  ``ADD`` / ``MOVE`` / ``COPY`` / ``LOAD SILENT``) is a pure
  transform: ``update`` returns the NEW triples DataFrame instead of
  mutating in place (commit it through the snapshot catalog); a quad
  with no GRAPH term deletes across graphs / inserts with NULL graph,
  the ``remove_triples`` convention.

Round 4 closed the last four SPARQL 1.1 grammar gaps: ``BASE`` (RFC
3986 resolution of every relative IRI token, incl. PREFIX bodies and
datatype IRIs), ``UNDEF`` in VALUES (solution-compatibility join —
unbound matches anything, merged binding coalesces bound-first),
property paths under ``GRAPH ?var`` (graph-keyed pair algebra: one
plan, closure per named graph, no per-graph loop), and UNION with
subquery arms.

Late round 4 added the remaining builtin surface: ``sameTerm`` /
``isNumeric`` (term identity and numeric-datatype tests over the same
metadata sidecars as LANG/DATATYPE), ``TIMEZONE`` (canonical
xsd:dayTimeDuration), XPath constructor casts (``xsd:integer(?x)``
etc.), the nondeterministic builtins ``NOW`` (one value per engine
call, §17.4.5.1) / ``RAND`` / ``UUID`` / ``STRUUID`` / ``BNODE()``,
bare ``FILTER BuiltInCall`` without parens, UPDATE's plain
``INSERT {} WHERE {}`` op and ``USING [NAMED]`` dataset clauses.

``SERVICE [SILENT] <iri> { ... }`` federates IN-PROCESS: the engine
has no network, so endpoints are registered triple tables
(``SparqlEngine(services={iri: df})``; the multi-graph manager
registers every managed graph automatically) — the pattern compiles
against the endpoint's own table and joins the outer solutions on the
shared variables; SILENT turns an unknown endpoint into the unit
solution per §2.4.

Not supported (raises): paths in CONSTRUCT/update templates (the
SPARQL grammar itself restricts templates to triples), ``SERVICE
?var`` (implementation-defined, §2.5), ``BNODE(?str)`` (the 0-arg
form works). IRI() over a *computed* string does not re-resolve
against BASE.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from types import SimpleNamespace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_NUMERIC_DTS = {XSD + s for s in ("integer", "decimal", "double", "float",
                                 "int", "long")}

_TOK = re.compile(
    r"""
      (?P<ws>\s+|\#[^\n]*)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<var>[?$][A-Za-z_][A-Za-z0-9_]*)
    | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
    | (?P<dtm>\^\^)
      # DECIMAL needs a digit after the point (SPARQL grammar): "1." is
      # INTEGER "1" + the triple terminator, not a decimal literal
    | (?P<num>[+-]?(?:\d+\.\d*[eE][+-]?\d+|(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?))
    | (?P<pname>[A-Za-z_][\w\-]*:[\w\-.%]*|:[\w\-.%]*)
    | (?P<lang>@[A-Za-z][A-Za-z0-9\-]*)
    | (?P<word>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>&&|\|\||!=|<=|>=|[{}().,;=<>!*/+?^|-])
    """,
    re.X,
)

_ESC = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _unquote(tok: str) -> str:
    body = tok[1:-1]
    out, i = [], 0
    while i < len(body):
        if body[i] == "\\" and i + 1 < len(body):
            out.append(_ESC.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(body[i])
            i += 1
    return "".join(out)


def _tokens(text: str) -> list[tuple[str, str]]:
    toks, pos = [], 0
    while pos < len(text):
        m = _TOK.match(text, pos)
        if m is None:
            raise ValueError(f"SPARQL lex error at {text[pos:pos + 30]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            if m.lastgroup == "var" and m.group()[1:].startswith("__"):
                # the "__" prefix is reserved for the engine's hidden
                # columns (metadata sidecars __m_*, __opt_/__hav helpers);
                # rejecting it at LEX time covers every position a
                # variable can appear in — triple patterns, BIND/AS
                # targets, sub-SELECT aliases, VALUES headers — so e.g.
                # BIND(1 AS ?__m_o__dt) can never clobber a sidecar
                raise ValueError(
                    f"reserved variable name {m.group()} ('__' prefix)")
            toks.append((m.lastgroup, m.group()))
    return toks


# ------------------------------------------------------------------- AST

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
# same shape heuristic operators/store.py uses for its obj_is_uri
# fallback — one engine-wide definition of "looks like an IRI"
_URI_SHAPE = r'^[A-Za-z][A-Za-z0-9+.\-]*:[^\s"<>]*$'

# term-introspection builtins: compiled against hidden metadata sidecar
# columns that _scan projects ONLY for the variables a query actually
# introspects (collected by _introspected_vars below), so every other
# query's plan is untouched
_INTROSPECT = {"LANG", "DATATYPE", "ISIRI", "ISURI", "ISLITERAL",
               "ISBLANK"}
# these also need the sidecars (term identity / numeric datatype), but
# compile through their own branches rather than _introspect's
_META_FUNCS = _INTROSPECT | {"SAMETERM", "ISNUMERIC"}


def _meta_col(var: str, kind: str) -> str:
    return f"__m_{var}__{kind}"


def _introspected_vars(parsed) -> set:
    """Walk a parsed query/update structure for introspection builtins
    applied to plain variables (computed arguments raise — metadata of a
    derived value is not defined in this engine)."""
    out: set = set()

    def walk(x):
        if isinstance(x, tuple):
            if x and x[0] == "func" and x[1] in _META_FUNCS:
                for arg in x[2]:
                    if arg[0] == "var":
                        out.add(arg[1])
                    elif arg[0] not in ("lit", "iri"):
                        raise ValueError(
                            f"{x[1]} argument must be a variable or "
                            f"constant")
            for y in x:
                walk(y)
        elif isinstance(x, list):
            for y in x:
                walk(y)
        elif isinstance(x, Group):
            walk(x.elements)
            walk(x.filters)
        elif isinstance(x, dict):
            for y in x.values():
                walk(y)

    walk(parsed)
    return out


def _expr_vars(e) -> set:
    """Variable names referenced anywhere in an expression tree."""
    out: set = set()

    def walk(x):
        if isinstance(x, tuple):
            if x and x[0] == "var":
                out.add(x[1])
                return
            for y in x:
                walk(y)
        elif isinstance(x, list):
            for y in x:
                walk(y)

    walk(e)
    return out


@dataclass
class Group:
    patterns: list = field(default_factory=list)   # (s, p, o, graph) terms
    optionals: list = field(default_factory=list)  # Group
    unions: list = field(default_factory=list)     # [Group, Group, ...]
    filters: list = field(default_factory=list)    # Expr
    binds: list = field(default_factory=list)      # (Expr, varname)
    subgroups: list = field(default_factory=list)  # Group (plain nesting)
    minuses: list = field(default_factory=list)    # Group
    values: list = field(default_factory=list)     # (varnames, rows)
    subselects: list = field(default_factory=list)  # parsed SELECT dicts
    # evaluation order: ("pattern"|"optional"|"union"|"bind"|"subgroup"|
    # "minus"|"values"|"subselect", payload) in textual order — SPARQL's
    # group algebra is built left-to-right (Join/LeftJoin/Minus/Extend in
    # sequence, §18.2.2.6), so a BIND binds its variable for everything
    # AFTER it and an OPTIONAL left-joins what came BEFORE it.  FILTERs
    # alone scope to the whole group and stay a separate end-applied list.
    elements: list = field(default_factory=list)


# Terms: ("var", name) | ("iri", value) | ("lit", lexical, dt, lang)
# Graph-position-only terms produced by the FROM/FROM NAMED rewrite:
# ("in", iris) restricts the scan to a named-graph set (empty = matches
# nothing), ("varin", name, iris) binds the graph variable AND restricts
# it to the FROM NAMED set.


def _dataset_fix(dflt: tuple, named: tuple):
    """Graph-term rewriter for a FROM/FROM NAMED dataset (§13.2): the
    query's default graph is the MERGE of the FROM graphs, and GRAPH
    matches only the FROM NAMED set — each side empty when its clause is
    absent."""
    def fix(pat):
        s, p, o, gr = pat
        if gr is None:
            return (s, p, o, ("in", dflt))
        if gr[0] == "iri":
            return pat if gr[1] in named else (s, p, o, ("in", ()))
        if gr[0] == "var":
            return (s, p, o, ("varin", gr[1], named))
        return pat
    return fix


_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokens(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None

    def _resolve(self, iri: str) -> str:
        """RFC 3986 resolution of a relative IRI against the query's
        BASE (SPARQL 1.1 §4.1.1); absolute IRIs (any scheme, incl. urn:)
        pass through verbatim, and with no BASE declared behavior is
        unchanged."""
        if self.base is None or _SCHEME.match(iri):
            return iri
        from urllib.parse import urljoin
        out = urljoin(self.base, iri)
        # urljoin drops an EMPTY trailing fragment ('ns#' → 'ns'), but
        # vocabulary namespace IRIs end in a bare '#' — restore it
        if iri.endswith("#") and not out.endswith("#"):
            out += "#"
        return out

    # -- token helpers --------------------------------------------------
    def _peek(self, k: int = 0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _kw(self, word: str) -> bool:
        kind, val = self._peek()
        if kind == "word" and val.upper() == word:
            self.i += 1
            return True
        return False

    def _expect(self, kind: str, val: str | None = None):
        k, v = self._next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"SPARQL parse error: expected {val or kind}, "
                             f"got {v!r}")
        return v

    def _at(self, kind: str, val: str | None = None) -> bool:
        k, v = self._peek()
        return k == kind and (val is None or v == val)

    # -- prologue / terms ----------------------------------------------
    def _prologue(self):
        while True:
            kind, val = self._peek()
            if kind == "word" and val.upper() == "PREFIX":
                self.i += 1
                pk, pv = self._next()
                if pk != "pname" or not pv.endswith(":"):
                    raise ValueError(f"bad PREFIX label {pv!r}")
                iri = self._expect("iri")
                # PREFIX IRIs resolve against a preceding BASE (§4.1.1)
                self.prefixes[pv[:-1]] = self._resolve(iri[1:-1])
            elif kind == "word" and val.upper() == "BASE":
                self.i += 1
                b = self._expect("iri")[1:-1]
                # a later BASE resolves against the earlier one (RFC 3986
                # §5.1; repeated BASE declarations are legal SPARQL)
                self.base = self._resolve(b)
            else:
                return

    def _pname(self, tok: str) -> str:
        pfx, local = tok.split(":", 1)
        if pfx not in self.prefixes:
            raise ValueError(f"undeclared prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def _term(self):
        kind, val = self._next()
        if kind == "var":
            return ("var", val[1:])
        if kind == "iri":
            return ("iri", self._resolve(val[1:-1]))
        if kind == "pname":
            return ("iri", self._pname(val))
        if kind == "word" and val == "a":
            return ("iri", RDF_TYPE)
        if kind == "word" and val.upper() in ("TRUE", "FALSE"):
            return ("lit", val.lower(), XSD + "boolean", None)
        if kind == "num":
            dt = ("integer" if re.fullmatch(r"[+-]?\d+", val) else
                  "double" if ("e" in val or "E" in val) else "decimal")
            return ("lit", val, XSD + dt, None)
        if kind == "str":
            lex = _unquote(val)
            nk, nv = self._peek()
            if nk == "dtm":
                self.i += 1
                dk, dv = self._next()
                dt = self._resolve(dv[1:-1]) if dk == "iri" \
                    else self._pname(dv)
                return ("lit", lex, dt, None)
            if nk == "lang":
                self.i += 1
                return ("lit", lex, None, nv[1:])
            return ("lit", lex, None, None)
        raise ValueError(f"unexpected term {val!r}")

    # -- property paths (SPARQL 1.1 §9) ---------------------------------
    # Path AST nodes: ("seq", [p...]) ("alt", [p...]) ("inv", p)
    # ("plus", p) ("star", p) ("opt", p); a trivial path stays a plain
    # ("iri", v) / ("var", v) predicate term.

    def _path(self):
        arms = [self._path_seq()]
        while self._at("op", "|"):
            self.i += 1
            arms.append(self._path_seq())
        if len(arms) == 1:
            return arms[0]
        for a in arms:
            self._path_no_var(a)
        return ("alt", arms)

    def _path_seq(self):
        elts = [self._path_elt()]
        while self._at("op", "/"):
            self.i += 1
            elts.append(self._path_elt())
        if len(elts) == 1:
            return elts[0]
        for e in elts:
            self._path_no_var(e)
        return ("seq", elts)

    def _path_elt(self):
        inv = self._at("op", "^")
        if inv:
            self.i += 1
        p = self._path_primary()
        kind, val = self._peek()
        if kind == "op" and val in ("*", "+", "?"):
            self.i += 1
            self._path_no_var(p)
            p = ({"*": "star", "+": "plus", "?": "opt"}[val], p)
        if inv:
            self._path_no_var(p)
            p = ("inv", p)
        return p

    def _path_primary(self):
        if self._at("op", "("):
            self.i += 1
            p = self._path()
            self._expect("op", ")")
            return p
        if self._at("op", "!"):
            self.i += 1
            return self._negated_property_set()
        t = self._term()
        if t[0] not in ("iri", "var"):
            raise ValueError(f"invalid term in property path: {t!r}")
        return t

    def _negated_property_set(self):
        """``!iri`` / ``!^iri`` / ``!(iri|^iri|...)`` → ("nps", fwd, inv):
        the forward arm matches predicates ∉ fwd (present iff the set has
        forward members), the inverse arm matches reversed predicates
        ∉ inv (iff it has ^members) — SPARQL 1.1 §9.2."""
        fwd: list[str] = []
        inv: list[str] = []

        def member():
            is_inv = self._at("op", "^")
            if is_inv:
                self.i += 1
            t = self._term()
            if t[0] != "iri":
                raise ValueError("negated property sets may only "
                                 "contain IRIs")
            (inv if is_inv else fwd).append(t[1])

        if self._at("op", "("):
            self.i += 1
            member()
            while self._at("op", "|"):
                self.i += 1
                member()
            self._expect("op", ")")
        else:
            member()
        return ("nps", fwd, inv)

    def _path_no_var(self, p):
        if p[0] == "var":
            raise ValueError("variables cannot appear inside property "
                             "paths")
        if p[0] in ("alt", "seq"):
            for q in p[1]:
                self._path_no_var(q)
        elif p[0] in ("inv", "plus", "star", "opt"):
            self._path_no_var(p[1])

    # -- group graph pattern -------------------------------------------
    def _group(self, graph=None) -> Group:
        self._expect("op", "{")
        g = Group()
        while not self._at("op", "}"):
            if self._kw("OPTIONAL"):
                opt = self._group(graph)
                g.optionals.append(opt)
                g.elements.append(("optional", opt))
            elif self._kw("FILTER"):
                g.filters.append(self._bracketed_expr())
            elif self._kw("BIND"):
                self._expect("op", "(")
                e = self._expr()
                if not self._kw("AS"):
                    raise ValueError("BIND needs AS ?var")
                var = self._expect("var")[1:]
                self._expect("op", ")")
                g.binds.append((e, var))
                g.elements.append(("bind", (e, var)))
            elif self._kw("MINUS"):
                m = self._group(graph)
                g.minuses.append(m)
                g.elements.append(("minus", m))
            elif self._kw("VALUES"):
                v = self._values_block()
                g.values.append(v)
                g.elements.append(("values", v))
            elif self._kw("GRAPH"):
                gterm = self._term()
                sub = self._group(gterm)
                g.subgroups.append(sub)
                g.elements.append(("subgroup", sub))
            elif self._kw("SERVICE"):
                # SPARQL 1.1 Federated Query: the pattern evaluates
                # against the endpoint's own dataset, so the inner group
                # parses with NO ambient graph term and the FROM/WITH
                # graph rewrites never descend into it
                silent = self._kw("SILENT")
                t = self._term()
                if t[0] not in ("iri", "var"):
                    raise ValueError(
                        "SERVICE endpoint must be an IRI or a variable "
                        f"(got {t[0]})")
                g.elements.append(("service", (silent, t,
                                               self._group(None))))
            elif self._at("op", "{") and self._peek(1)[0] == "word" \
                    and self._peek(1)[1].upper() == "SELECT":
                # subquery: { SELECT ... } — evaluated independently,
                # joined on its projected variables (SPARQL 1.1 §12)
                self.i += 2
                sq = self._select(sub=True)
                self._expect("op", "}")
                if self._kw("UNION"):
                    # UNION with a subquery arm: arms are heterogeneous —
                    # ("sq", parsed-select) wrappers beside plain Groups
                    arms = [("sq", sq), self._union_arm(graph)]
                    while self._kw("UNION"):
                        arms.append(self._union_arm(graph))
                    g.unions.append(arms)
                    g.elements.append(("union", arms))
                else:
                    g.subselects.append(sq)
                    g.elements.append(("subselect", sq))
            elif self._at("op", "{"):
                sub = self._group(graph)
                if self._kw("UNION"):
                    arms = [sub, self._union_arm(graph)]
                    while self._kw("UNION"):
                        arms.append(self._union_arm(graph))
                    g.unions.append(arms)
                    g.elements.append(("union", arms))
                else:
                    g.subgroups.append(sub)
                    g.elements.append(("subgroup", sub))
            else:
                self._triples_block(g, graph)
            self._kw_dot_opt()
        self._expect("op", "}")
        return g

    def _union_arm(self, graph):
        """One arm of a UNION: a group graph pattern, or a subquery
        block ``{ SELECT ... }`` wrapped as ``("sq", parsed)``."""
        if self._at("op", "{") and self._peek(1)[0] == "word" \
                and self._peek(1)[1].upper() == "SELECT":
            self.i += 2
            sq = self._select(sub=True)
            self._expect("op", "}")
            return ("sq", sq)
        return self._group(graph)

    def _values_block(self) -> tuple[list[str], list[tuple]]:
        """``VALUES ?v { t ... }`` / ``VALUES (?a ?b) { (ta tb) ... }`` —
        ground IRI/literal terms; ``UNDEF`` parses to ``None`` (the
        variable is unbound in that row — §10.2) and the compiler joins
        such blocks with SPARQL solution-compatibility semantics."""
        if self._at("var"):
            names = [self._next()[1][1:]]
            single = True
        else:
            self._expect("op", "(")
            names = []
            while self._at("var"):
                names.append(self._next()[1][1:])
            self._expect("op", ")")
            single = False
        if not names:
            raise ValueError("VALUES needs at least one variable")
        self._expect("op", "{")
        rows: list[tuple] = []

        def ground(t):
            if t[0] == "var":
                raise ValueError("variables cannot appear in VALUES data")
            return t[1]

        while not self._at("op", "}"):
            if single:
                rows.append((None,) if self._kw("UNDEF")
                            else (ground(self._term()),))
            else:
                self._expect("op", "(")
                row = []
                while not self._at("op", ")"):
                    row.append(None if self._kw("UNDEF")
                               else ground(self._term()))
                self._expect("op", ")")
                if len(row) != len(names):
                    raise ValueError("VALUES row arity mismatch")
                rows.append(tuple(row))
        self._expect("op", "}")
        if not rows:
            raise ValueError("empty VALUES block")
        return names, rows

    def _kw_dot_opt(self):
        while self._at("op", "."):
            self.i += 1

    def _triples_block(self, g: Group, graph):
        subj = self._term()
        while True:
            pred = self._path()
            while True:
                obj = self._term()
                g.patterns.append((subj, pred, obj, graph))
                g.elements.append(("pattern", (subj, pred, obj, graph)))
                if self._at("op", ","):
                    self.i += 1
                    continue
                break
            if self._at("op", ";"):
                self.i += 1
                if self._at("op", ".") or self._at("op", "}"):
                    break                       # dangling ';'
                continue
            break

    # -- expressions ----------------------------------------------------
    def _bracketed_expr(self):
        # FILTER EXISTS { } / FILTER NOT EXISTS { } come without parens
        if self._kw("EXISTS"):
            return ("exists", True, self._group(None))
        if self._kw("NOT"):
            if not self._kw("EXISTS"):
                raise ValueError("expected EXISTS after NOT")
            return ("exists", False, self._group(None))
        kind, val = self._peek()
        # Constraint ::= BrackettedExpression | BuiltInCall | FunctionCall
        # (§19.8 [69]): FILTER sameTerm(?a, ?b) needs no extra parens
        if (kind == "word" and val.upper() in self._FUNCS
                and self._peek(1) == ("op", "(")) or \
                (kind in ("pname", "iri") and self._peek(1) == ("op", "(")):
            return self._unary()
        self._expect("op", "(")
        e = self._expr()
        self._expect("op", ")")
        return e

    def _expr(self):
        return self._or()

    def _or(self):
        e = self._and()
        while self._at("op", "||"):
            self.i += 1
            e = ("or", e, self._and())
        return e

    def _and(self):
        e = self._rel()
        while self._at("op", "&&"):
            self.i += 1
            e = ("and", e, self._rel())
        return e

    def _rel(self):
        e = self._unary()
        kind, val = self._peek()
        if kind == "op" and val in ("=", "!=", "<", ">", "<=", ">="):
            self.i += 1
            return ("cmp", val, e, self._unary())
        if kind == "word" and val.upper() == "IN":
            self.i += 1
            self._expect("op", "(")
            items = [self._expr()]
            while self._at("op", ","):
                self.i += 1
                items.append(self._expr())
            self._expect("op", ")")
            return ("in", e, items)
        if kind == "word" and val.upper() == "NOT" and \
                self._peek(1)[1].upper() == "IN":
            self.i += 2
            self._expect("op", "(")
            items = [self._expr()]
            while self._at("op", ","):
                self.i += 1
                items.append(self._expr())
            self._expect("op", ")")
            return ("not", ("in", e, items))
        return e

    _FUNCS = {"CONTAINS": 2, "STRSTARTS": 2, "STRENDS": 2, "STRLEN": 1,
              "LCASE": 1, "UCASE": 1, "STR": 1, "BOUND": 1,
              "REGEX": (2, 3), "IF": 3, "CONCAT": None, "COALESCE": None,
              "SUBSTR": (2, 3), "REPLACE": (3, 4), "STRBEFORE": 2,
              "STRAFTER": 2, "ABS": 1, "ROUND": 1, "CEIL": 1, "FLOOR": 1,
              "MD5": 1, "SHA1": 1, "SHA256": 1, "SHA384": 1, "SHA512": 1,
              "ENCODE_FOR_URI": 1, "YEAR": 1, "MONTH": 1, "DAY": 1,
              "HOURS": 1, "MINUTES": 1, "SECONDS": 1, "TZ": 1,
              "LANG": 1, "DATATYPE": 1, "ISIRI": 1, "ISURI": 1,
              "ISLITERAL": 1, "ISBLANK": 1, "LANGMATCHES": 2,
              "IRI": 1, "URI": 1, "STRLANG": 2, "STRDT": 2,
              "SAMETERM": 2, "ISNUMERIC": 1, "TIMEZONE": 1,
              "NOW": 0, "RAND": 0, "UUID": 0, "STRUUID": 0, "BNODE": 0}

    def _unary(self):
        kind, val = self._peek()
        if kind == "op" and val == "!":
            self.i += 1
            return ("not", self._unary())
        if kind == "op" and val == "(":
            self.i += 1
            e = self._expr()
            self._expect("op", ")")
            return e
        if kind == "word":
            up = val.upper()
            if up in self._AGGS and self._peek(1) == ("op", "("):
                # aggregate call inside an expression (HAVING / ORDER BY)
                return self._agg_or_expr()
            if up == "EXISTS":
                self.i += 1
                return ("exists", True, self._group(None))
            if up == "NOT" and self._peek(1)[1].upper() == "EXISTS":
                self.i += 2
                return ("exists", False, self._group(None))
            if up in self._FUNCS:
                self.i += 1
                self._expect("op", "(")
                args = []
                if not self._at("op", ")"):
                    args.append(self._expr())
                    while self._at("op", ","):
                        self.i += 1
                        args.append(self._expr())
                self._expect("op", ")")
                want = self._FUNCS[up]
                ok = (True if want is None else
                      (len(args) in want) if isinstance(want, tuple)
                      else len(args) == want)
                if not ok:
                    raise ValueError(f"{up} arity {len(args)}")
                return ("func", up, args)
        if kind in ("pname", "iri") and self._peek(1) == ("op", "("):
            # XPath constructor function call — xsd:integer(?x) etc.
            # (SPARQL 1.1 §17.5); normalized to ("func","CAST",[dt, arg])
            dt = (self._pname(val) if kind == "pname"
                  else self._resolve(val[1:-1]))
            self.i += 2
            arg = self._expr()
            self._expect("op", ")")
            return ("func", "CAST", [("iri", dt), arg])
        return self._term()

    # -- query forms ----------------------------------------------------
    def parse(self) -> dict:
        self._prologue()
        self.dataset: tuple | None = None
        q = self._form()
        if self.dataset is not None:
            # FROM / FROM NAMED dataset clauses (SPARQL 1.1 §13.2):
            # rewrite graph terms once at parse time so the compiler is
            # untouched — patterns with no GRAPH match the merged FROM
            # graphs, GRAPH <iri>/?var restrict to the FROM NAMED set
            # (absent clause ⇒ that side of the dataset is empty)
            q["_dataset"] = self.dataset
            if q.get("where") is not None:
                self._rewrite_graphs(q["where"],
                                     _dataset_fix(*self.dataset))
        return q

    def _parse_dataset(self, sub: bool = False) -> None:
        while self._at("word") and self._peek()[1].upper() == "FROM":
            if sub:
                raise ValueError("FROM is not allowed in a subquery")
            self.i += 1
            dflt, named = self.dataset or ((), ())
            if self._kw("NAMED"):
                named = named + (self._iri_str(),)
            else:
                dflt = dflt + (self._iri_str(),)
            self.dataset = (dflt, named)

    def _form(self) -> dict:
        if self._kw("SELECT"):
            return self._select()
        if self._kw("ASK"):
            self._parse_dataset()
            return {"form": "ask", "where": self._where_group()}
        if self._kw("CONSTRUCT"):
            if not self._at("op", "{"):
                # SPARQL 1.1 §10.2.3 shorthand: CONSTRUCT [FROM ...]
                # WHERE { BGP } — the pattern doubles as the template;
                # the spec restricts the body to a basic graph pattern
                # (no FILTER/OPTIONAL/paths), which _triples_block
                # enforces by construction and the path check below
                # completes
                self._parse_dataset()
                if not self._kw("WHERE"):
                    raise ValueError("CONSTRUCT needs a { template } "
                                     "or WHERE")
                g = Group()
                self._expect("op", "{")
                while not self._at("op", "}"):
                    self._triples_block(g, None)
                    self._kw_dot_opt()
                self._expect("op", "}")
                for _s, _p, _o, _g in g.patterns:
                    if _p[0] not in ("iri", "var"):
                        raise ValueError(
                            "property paths are not allowed in "
                            "CONSTRUCT WHERE")
                q = {"form": "construct", "template": g.patterns,
                     "where": g}
                q.update(self._modifiers())
                return q
            tmpl = Group()
            self._expect("op", "{")
            while not self._at("op", "}"):
                self._triples_block(tmpl, None)
                self._kw_dot_opt()
            self._expect("op", "}")
            self._parse_dataset()
            if not self._kw("WHERE"):
                raise ValueError("CONSTRUCT needs WHERE")
            for _s, _p, _o, _g in tmpl.patterns:
                if _p[0] not in ("iri", "var"):
                    raise ValueError("property paths are not allowed in "
                                     "CONSTRUCT templates")
            q = {"form": "construct", "template": tmpl.patterns,
                 "where": self._group(None)}
            q.update(self._modifiers())
            return q
        if self._kw("DESCRIBE"):
            star, vars_, iris = False, [], []
            while True:
                if self._at("op", "*"):
                    self.i += 1
                    star = True
                elif self._at("var"):
                    vars_.append(self._next()[1][1:])
                elif self._at("iri") or self._at("pname"):
                    iris.append(self._term()[1])
                else:
                    break
            if not (star or vars_ or iris):
                raise ValueError("DESCRIBE needs * or at least one "
                                 "variable/IRI")
            self._parse_dataset()
            where = None
            if self._at("op", "{") or (
                    self._peek()[0] == "word"
                    and self._peek()[1].upper() == "WHERE"):
                where = self._where_group()
            elif star or vars_:
                raise ValueError("DESCRIBE with variables needs WHERE")
            q = {"form": "describe", "star": star, "vars": vars_,
                 "iris": iris, "where": where}
            q.update(self._modifiers())
            return q
        raise ValueError("expected SELECT / ASK / CONSTRUCT / DESCRIBE "
                         "(for updates call SparqlEngine.update)")

    # -- update forms ---------------------------------------------------
    def parse_update(self) -> list[tuple]:
        """``INSERT DATA`` / ``DELETE DATA`` / ``DELETE WHERE`` /
        ``[WITH <g>] DELETE {} INSERT {} WHERE {}`` plus the graph-
        management forms ``CLEAR``/``DROP``/``CREATE``/``ADD``/``MOVE``/
        ``COPY``/``LOAD`` — pyoxigraph executes all of these via
        ``store.update`` (reference sparql_update,
        kgraph_rdf_db.py:342-357).  Operations may chain with ``;``."""
        self._prologue()
        ops: list[tuple] = []
        while self._peek()[0] != "eof":
            if self._kw("INSERT"):
                if self._kw("DATA"):
                    ops.append(("insert_data",
                                self._ground_quads(self._group(None))))
                else:
                    ops.append(self._insert_tail(None))
            elif self._kw("DELETE"):
                ops.append(self._delete_tail(None))
            elif self._kw("WITH"):
                # WITH <g>: default graph for template quads AND for
                # WHERE patterns that carry no GRAPH block (SPARQL 1.1
                # Update §3.1.3) — applied as a graph-term rewrite so
                # the rest of the compiler is untouched
                wg = self._iri_str()
                if self._kw("DELETE"):
                    ops.append(self._delete_tail(wg))
                elif self._kw("INSERT"):
                    ops.append(self._insert_tail(wg))
                else:
                    raise ValueError("WITH needs DELETE or INSERT")
            elif self._kw("CLEAR") or self._kw("DROP"):
                # DROP == CLEAR on a quad table: graphs exist implicitly,
                # so removing a graph's quads IS dropping it (documented
                # divergence from stores that track empty named graphs)
                self._kw("SILENT")
                ops.append(("clear", self._clear_target()))
            elif self._kw("CREATE"):
                # graphs exist implicitly in a quad table — CREATE is a
                # validated no-op (SILENT or not, it cannot fail here)
                self._kw("SILENT")
                if not self._kw("GRAPH"):
                    raise ValueError("CREATE needs GRAPH <iri>")
                self._iri_str()
                ops.append(("noop",))
            elif self._at("word") and self._peek()[1].upper() in (
                    "ADD", "MOVE", "COPY"):
                kind = self._next()[1].lower()
                self._kw("SILENT")
                src = self._graph_or_default()
                if not self._kw("TO"):
                    raise ValueError(f"{kind.upper()} needs TO")
                ops.append((kind, src, self._graph_or_default()))
            elif self._kw("LOAD"):
                silent = self._kw("SILENT")
                self._iri_str()
                if self._kw("INTO"):
                    if not self._kw("GRAPH"):
                        raise ValueError("LOAD ... INTO needs GRAPH <iri>")
                    self._iri_str()
                if not silent:
                    raise ValueError(
                        "LOAD needs network I/O this engine does not do — "
                        "parse the document with kgraphmemory_spark.io.rdf "
                        "and union it in; LOAD SILENT is accepted as a "
                        "no-op (SPARQL 1.1 §3.1.4 SILENT swallows the "
                        "failure)")
                ops.append(("noop",))
            else:
                raise ValueError(f"unexpected update token "
                                 f"{self._peek()[1]!r}")
            while self._at("op", ";"):
                self.i += 1
        if not ops:
            raise ValueError("empty update request")
        return ops

    def _delete_tail(self, with_g: str | None):
        """The token stream after DELETE (WITH prefix already consumed)."""
        if with_g is None and self._kw("DATA"):
            return ("delete_data", self._ground_quads(self._group(None)))
        if self._kw("WHERE"):
            g = self._apply_with(self._group(None), with_g)
            return ("modify", self._with_quads(self._flat_patterns(g),
                                               with_g), [], g)
        dtmpl = self._with_quads(self._flat_patterns(self._group(None)),
                                 with_g)
        itmpl = []
        if self._kw("INSERT"):
            itmpl = self._with_quads(self._flat_patterns(self._group(None)),
                                     with_g)
        return ("modify", dtmpl, itmpl, self._modify_where(with_g))

    def _insert_tail(self, with_g: str | None):
        """The token stream after an INSERT-only Modify op's INSERT
        keyword (DATA already ruled out): template, then USING*/WHERE."""
        itmpl = self._with_quads(self._flat_patterns(self._group(None)),
                                 with_g)
        return ("modify", [], itmpl, self._modify_where(with_g))

    def _modify_where(self, with_g: str | None) -> Group:
        """``UsingClause* WHERE GroupGraphPattern`` — the Modify tail
        (SPARQL 1.1 Update §3.1.3).  USING / USING NAMED assemble a
        FROM-style dataset for the WHERE pattern and, per spec, override
        WITH there (WITH keeps governing the template quads only); with
        no USING clause the WITH graph scopes ungraphed WHERE patterns."""
        using = None
        while self._kw("USING"):
            dflt, named = using or ((), ())
            if self._kw("NAMED"):
                named += (self._iri_str(),)
            else:
                dflt += (self._iri_str(),)
            using = (dflt, named)
        if not self._kw("WHERE"):
            raise ValueError("DELETE {} / INSERT {} template needs WHERE")
        g = self._group(None)
        if using is not None:
            return self._rewrite_graphs(g, _dataset_fix(*using))
        return self._apply_with(g, with_g)

    def _iri_str(self) -> str:
        kind, val = self._next()
        if kind == "iri":
            return self._resolve(val[1:-1])
        if kind == "pname":
            return self._pname(val)
        raise ValueError(f"expected IRI, got {val!r}")

    def _clear_target(self):
        if self._kw("DEFAULT"):
            return "default"
        if self._kw("NAMED"):
            return "named"
        if self._kw("ALL"):
            return "all"
        if not self._kw("GRAPH"):
            raise ValueError(
                "CLEAR/DROP needs GRAPH <iri> / DEFAULT / NAMED / ALL")
        return self._iri_str()

    def _graph_or_default(self):
        if self._kw("DEFAULT"):
            return "default"
        self._kw("GRAPH")                       # optional keyword
        return self._iri_str()

    @staticmethod
    def _with_quads(quads: list, with_g: str | None) -> list:
        if with_g is None:
            return quads
        return [(s, p, o, gr if gr is not None else ("iri", with_g))
                for s, p, o, gr in quads]

    @classmethod
    def _apply_with(cls, g: Group, with_g: str | None) -> Group:
        """Rewrite every pattern with no GRAPH term to match only the
        WITH graph (SPARQL 1.1 Update §3.1.3).  Explicit GRAPH blocks
        already carry their term and are left alone."""
        if with_g is None:
            return g

        def fix(pat):
            s, p, o, gr = pat
            return (s, p, o, gr if gr is not None else ("iri", with_g))

        return cls._rewrite_graphs(g, fix)

    @classmethod
    def _rewrite_graphs(cls, g: Group, fix) -> Group:
        """Apply ``fix`` to every pattern's graph position, recursively
        through OPTIONAL/MINUS/subgroups/UNION arms, subselect bodies and
        EXISTS groups inside FILTER/BIND expressions.  Pattern tuples are
        immutable and referenced from BOTH ``patterns`` and ``elements``,
        so the two lists are rebuilt in lockstep; nested Groups are
        shared objects — mutating them once covers both views."""
        g.patterns = [fix(p) for p in g.patterns]
        out = []
        for kind, payload in g.elements:
            # "service" payloads pass through UNREWRITTEN by design: a
            # federated pattern evaluates against the endpoint's own
            # dataset, outside the query's FROM/WITH scope
            if kind == "pattern":
                payload = fix(payload)
            elif kind in ("optional", "subgroup", "minus"):
                cls._rewrite_graphs(payload, fix)
            elif kind == "union":
                for arm in payload:
                    if isinstance(arm, Group):
                        cls._rewrite_graphs(arm, fix)
                    elif isinstance(arm, tuple) and arm[0] == "sq":
                        cls._rewrite_graphs(arm[1]["where"], fix)
            elif kind == "subselect":
                cls._rewrite_graphs(payload["where"], fix)
            elif kind == "bind":
                cls._rewrite_expr_groups(payload[0], fix)
            out.append((kind, payload))
        g.elements = out
        for e in g.filters:
            cls._rewrite_expr_groups(e, fix)
        return g

    @classmethod
    def _rewrite_expr_groups(cls, e, fix) -> None:
        """EXISTS / NOT EXISTS groups hide inside expression trees."""
        if isinstance(e, tuple):
            if e and e[0] == "exists":
                cls._rewrite_graphs(e[2], fix)
                return
            for y in e:
                cls._rewrite_expr_groups(y, fix)
        elif isinstance(e, list):
            for y in e:
                cls._rewrite_expr_groups(y, fix)

    def _flat_patterns(self, g: Group) -> list:
        """Group → flat (s, p, o, graph) list; only plain triples and
        GRAPH blocks are allowed in templates / DATA blocks."""
        if (g.optionals or g.unions or g.filters or g.binds or g.minuses
                or g.values or g.subselects):
            raise ValueError("only triples and GRAPH blocks are allowed "
                             "in DATA blocks / update templates")
        out = list(g.patterns)
        for s, p, o, gr in out:
            if p[0] not in ("iri", "var"):
                raise ValueError("property paths are not allowed in "
                                 "templates / DATA blocks")
        for sub in g.subgroups:
            out.extend(self._flat_patterns(sub))
        return out

    def _ground_quads(self, g: Group) -> list:
        quads = self._flat_patterns(g)
        for s, p, o, gr in quads:
            for t in (s, p, o) + ((gr,) if gr else ()):
                if t[0] == "var":
                    raise ValueError(f"?{t[1]} in a DATA block — DATA "
                                     "requires ground triples")
        return quads

    def _where_group(self) -> Group:
        self._kw("WHERE")
        return self._group(None)

    def _select(self, sub: bool = False) -> dict:
        q: dict = {"form": "select", "distinct": self._kw("DISTINCT"),
                   "proj": []}
        while True:
            if self._at("op", "*"):
                self.i += 1
                q["proj"].append(("star",))
            elif self._at("var"):
                q["proj"].append(("plain", self._next()[1][1:]))
            elif self._at("op", "("):
                self.i += 1
                e = self._agg_or_expr()
                if not self._kw("AS"):
                    raise ValueError("projection expression needs AS ?var")
                var = self._expect("var")[1:]
                self._expect("op", ")")
                q["proj"].append(("expr", e, var))
            else:
                break
        self._parse_dataset(sub=sub)
        q["where"] = self._where_group()
        q.update(self._modifiers(sub=sub))
        return q

    _AGGS = ("COUNT", "SUM", "MIN", "MAX", "AVG", "GROUP_CONCAT",
             "SAMPLE")

    def _agg_or_expr(self):
        kind, val = self._peek()
        if kind == "word" and val.upper() in self._AGGS:
            agg = val.upper()
            self.i += 1
            self._expect("op", "(")
            distinct = self._kw("DISTINCT")
            if self._at("op", "*"):
                self.i += 1
                arg = ("star",)
            else:
                arg = self._expr()
            sep = " "
            if self._at("op", ";"):
                self.i += 1
                if not (self._kw("SEPARATOR")):
                    raise ValueError("expected SEPARATOR")
                self._expect("op", "=")
                sep = _unquote(self._expect("str"))
            self._expect("op", ")")
            return ("agg", agg, distinct, arg, sep)
        return self._expr()

    def _modifiers(self, sub: bool = False) -> dict:
        out: dict = {"group_by": [], "order_by": [], "limit": None,
                     "offset": None, "having": []}
        while True:
            if self._kw("GROUP"):
                if not self._kw("BY"):
                    raise ValueError("expected BY after GROUP")
                while self._at("var"):
                    out["group_by"].append(self._next()[1][1:])
            elif self._kw("HAVING"):
                if not self._at("op", "("):
                    raise ValueError("HAVING needs a parenthesized "
                                     "constraint")
                while self._at("op", "("):
                    self.i += 1
                    out["having"].append(self._expr())
                    self._expect("op", ")")
            elif self._kw("ORDER"):
                if not self._kw("BY"):
                    raise ValueError("expected BY after ORDER")
                while True:
                    if self._kw("DESC"):
                        self._expect("op", "(")
                        out["order_by"].append((self._expr(), False))
                        self._expect("op", ")")
                    elif self._kw("ASC"):
                        self._expect("op", "(")
                        out["order_by"].append((self._expr(), True))
                        self._expect("op", ")")
                    elif self._at("var"):
                        out["order_by"].append(
                            (("var", self._next()[1][1:]), True))
                    else:
                        break
            elif self._kw("LIMIT"):
                out["limit"] = int(self._expect("num"))
            elif self._kw("OFFSET"):
                out["offset"] = int(self._expect("num"))
            else:
                break
        if sub:
            return out                 # caller consumes the closing '}'
        if self._peek()[0] != "eof":
            raise ValueError(f"trailing tokens at {self._peek()[1]!r}")
        return out


# -------------------------------------------------------------- compiler

class SparqlEngine:
    """Executes the SPARQL fragment against a triples DataFrame with
    columns (subject, predicate, object[, obj_datatype, obj_lang,
    graph]) — the shape every store/pipeline table in this engine
    shares."""

    def __init__(self, triples: DataFrame,
                 services: dict[str, DataFrame] | None = None):
        self.triples = triples
        self.cols = set(triples.columns)
        # SERVICE endpoint registry: IRI → that service's triple table
        # (in-process federation — the engine has no network; the
        # multi-graph manager registers every managed graph here so
        # SERVICE <graph-uri> { ... } federates across memories)
        self.services = services or {}
        self._meta: set = frozenset()
        # observability: after a query with a +/* path, carries
        # {'rounds': N} from the frontier-expansion closure — the bench
        # asserts O(depth) rounds at the 10M-edge scale (SURVEY §2.9 /
        # VERDICT r3 item 6); same discipline as operators/cc.py's stats
        self.closure_stats: dict = {}

    # -- public forms ---------------------------------------------------
    def query(self, text: str) -> DataFrame:
        """SELECT → DataFrame whose columns are the projected variables
        (reference: sparql_query returns dict rows, kgraph.py:185-198)."""
        q = _Parser(text).parse()
        if q["form"] != "select":
            raise ValueError(f"query() got a {q['form']} query")
        self._now = None
        self._meta = _introspected_vars(q)
        return self._select(q)

    def ask(self, text: str) -> bool:
        """ASK → bool (kgraph.py:212-222)."""
        q = _Parser(text).parse()
        if q["form"] != "ask":
            raise ValueError(f"ask() got a {q['form']} query")
        self._now = None
        self._meta = _introspected_vars(q)
        df, _ = self._group(q["where"])
        return df.limit(1).count() > 0

    def construct(self, text: str) -> DataFrame:
        """CONSTRUCT → (subject, predicate, object) triples
        (kgraph.py:200-210); deduplicated — a graph is a set."""
        q = _Parser(text).parse()
        if q["form"] != "construct":
            raise ValueError(f"construct() got a {q['form']} query")
        self._now = None
        self._meta = _introspected_vars(q)
        df, bound = self._group(q["where"])
        df = self._modifiers(df, q, bound)
        parts = []
        for s, p, o, _ in q["template"]:
            def col(term):
                if term[0] == "var":
                    if term[1] not in bound:
                        raise ValueError(f"unbound template var ?{term[1]}")
                    return F.col(term[1])
                if term[0] == "iri":
                    return F.lit(term[1])
                return F.lit(term[1])            # literal lexical form
            parts.append(df.select(col(s).alias("subject"),
                                   col(p).alias("predicate"),
                                   col(o).alias("object")))
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.distinct()

    def describe(self, text: str) -> DataFrame:
        """DESCRIBE → every stored triple (all columns) whose subject is a
        described resource.  The spec leaves the description's extent to
        the implementation (SPARQL 1.1 §16.4); this engine returns the
        simple subject description — the natural form for a store whose
        nodes are all named URIs (skolemized ids, no blank nodes to close
        over; pyoxigraph behind the reference likewise describes without
        CBD blank-node chasing).  Resources = the explicit IRIs plus the
        distinct values of the DESCRIBE variables over the WHERE
        solutions (solution modifiers applied first, so ORDER BY/LIMIT
        bound the resource set, not the emitted triples).  The semi-join
        against the store is left to AQE: a handful of solutions
        broadcasts, a million-solution describe stays a shuffle join."""
        q = _Parser(text).parse()
        if q["form"] != "describe":
            raise ValueError(f"describe() got a {q['form']} query")
        self._now = None
        self._meta = _introspected_vars(q)
        parts = []
        if q["where"] is not None:
            df, bound = self._group(q["where"])
            df = self._modifiers(df, q, bound)
            vs = sorted(bound) if q["star"] else q["vars"]
            for v in vs:
                if v not in bound:
                    raise ValueError(f"DESCRIBE variable ?{v} is not "
                                     "bound by the WHERE group")
                parts.append(df.select(F.col(v).alias("r")))
        if q["iris"]:
            spark = self.triples.sparkSession
            parts.append(spark.createDataFrame(
                [(i,) for i in q["iris"]], "r string"))
        res = parts[0]
        for p in parts[1:]:
            res = res.unionByName(p)
        res = res.distinct()
        store = self.triples
        if q.get("_dataset"):
            # the description itself comes from the FROM graphs (§13.2:
            # the query's default graph is their merge)
            dflt = list(q["_dataset"][0])
            store = store.where(F.col("graph").isin(dflt) if dflt
                                else F.lit(False))
        return store.join(
            res, store["subject"] == res["r"], "left_semi")

    # -- update ---------------------------------------------------------
    def update(self, text: str) -> DataFrame:
        """SPARQL UPDATE (INSERT DATA / DELETE DATA / DELETE WHERE /
        [WITH <g>] DELETE {} INSERT {} [USING [NAMED] <g>]* WHERE {},
        plus graph management:
        CLEAR / DROP / CREATE / ADD / MOVE / COPY / LOAD SILENT)
        → the NEW triples DataFrame — the
        engine's tables are immutable transforms (reference mutates its
        embedded store in place and returns bool,
        kgraph_rdf_db.py:342-357; commit the returned table through the
        snapshot catalog for the same effect).  A pattern/quad with no
        GRAPH term matches/inserts with a NULL graph wildcard — the same
        convention as operators.store.remove_triples."""
        ops = _Parser(text).parse_update()
        self._now = None
        self._meta = _introspected_vars(ops)
        df = self.triples
        for op in ops:
            if op[0] == "insert_data":
                df = df.unionByName(self._quad_df(op[1]),
                                    allowMissingColumns=True)
            elif op[0] == "delete_data":
                df = self._anti(df, self._quad_df(op[1]))
            elif op[0] == "noop":                # CREATE / LOAD SILENT
                pass
            elif op[0] == "clear":               # CLEAR / DROP
                df = self._clear(df, op[1])
            elif op[0] in ("add", "move", "copy"):
                df = self._graph_copy(df, *op)
            else:                                # ("modify", del, ins, where)
                _, dtmpl, itmpl, where = op
                sols, bound = self._group(where)
                if dtmpl:
                    df = self._anti(df, self._instantiate(sols, bound,
                                                          dtmpl,
                                                          mark_lex=True))
                if itmpl:
                    df = df.unionByName(self._instantiate(sols, bound,
                                                          itmpl),
                                        allowMissingColumns=True)
        return df

    def _graph_pred(self, target):
        """Row predicate for a graph operand: 'default' = NULL graph,
        else the named graph's IRI (null-safe so NULL-graph rows never
        leak through a named-graph match)."""
        if target == "default":
            return F.col("graph").isNull()
        return F.col("graph").eqNullSafe(F.lit(target))

    def _clear(self, df: DataFrame, target) -> DataFrame:
        """CLEAR/DROP: remove the target graph's quads (graphs exist
        implicitly in a quad table, so DROP ≡ CLEAR — documented
        divergence from stores that track empty named graphs)."""
        if "graph" not in self.cols:
            # single-graph table IS the default graph; a named target is
            # vacuous, DEFAULT/ALL empty the store
            return df.limit(0) if target in ("default", "all") else df
        if target == "all":
            return df.limit(0)
        if target == "named":
            return df.where(F.col("graph").isNull())
        return df.where(~self._graph_pred(target))

    def _graph_copy(self, df: DataFrame, kind, src, dst) -> DataFrame:
        """ADD / MOVE / COPY <src> TO <dst> (SPARQL 1.1 Update §3.2.3-5)
        as pure DataFrame algebra: relabel the source graph's quads, then
        set-union them in.  ADD keeps both and only inserts quads the
        destination lacks (set semantics); COPY replaces the destination;
        MOVE additionally drops the source.  src == dst is a no-op per
        spec."""
        if "graph" not in self.cols:
            raise ValueError(f"{kind.upper()} needs a graph column")
        if src == dst:
            return df
        moved = (df.where(self._graph_pred(src))
                 .withColumn("graph",
                             F.lit(None).cast("string") if dst == "default"
                             else F.lit(dst))
                 .distinct())
        if kind == "add":
            return df.unionByName(moved.subtract(df))
        out = df.where(~self._graph_pred(dst))
        if kind == "move":
            out = out.where(~self._graph_pred(src))
        return out.unionByName(moved)

    def _quad_df(self, quads: list) -> DataFrame:
        spark = self.triples.sparkSession
        rows = []
        for s, p, o, g in quads:
            dt = o[2] if o[0] == "lit" else None
            lang = o[3] if o[0] == "lit" else None
            rows.append((s[1], p[1], o[1], dt, lang,
                         g[1] if g is not None else None))
        df = spark.createDataFrame(
            rows, "subject string, predicate string, object string, "
                  "obj_datatype string, obj_lang string, graph string")
        keep = [c for c in df.columns if c in self.cols]
        return df.select(*keep)

    def _instantiate(self, sols: DataFrame, bound: set, tmpl: list,
                     mark_lex: bool = False) -> DataFrame:
        """Template × solutions → quad rows.  A variable in object
        position binds a *lexical form* (the solution columns are
        strings — the engine's data model), so the instantiated row
        carries NULL datatype/lang.  For DELETE templates
        (``mark_lex=True``) such rows additionally carry
        ``__lex_only=true`` so ``_anti`` matches them on lexical form
        alone — otherwise a variable delete template could never remove
        a typed or lang-tagged row (NULL ≠ ``xsd:dateTime`` under the
        null-safe compare).  INSERT keeps the NULL: typed-ness does not
        ride through variable bindings (documented deviation)."""
        parts = []
        for s, p, o, g in tmpl:
            def col(term):
                if term is None:
                    return F.lit(None).cast("string")
                if term[0] == "var":
                    if term[1] not in bound:
                        raise ValueError(
                            f"unbound template var ?{term[1]}")
                    return F.col(term[1])
                return F.lit(term[1])
            sel = [col(s).alias("subject"), col(p).alias("predicate"),
                   col(o).alias("object")]
            if "obj_datatype" in self.cols:
                sel.append(F.lit(o[2] if o[0] == "lit" else None)
                           .cast("string").alias("obj_datatype"))
            if "obj_lang" in self.cols:
                sel.append(F.lit(o[3] if o[0] == "lit" else None)
                           .cast("string").alias("obj_lang"))
            if "graph" in self.cols:
                sel.append(col(g).alias("graph"))
            if mark_lex:
                sel.append(F.lit(o[0] == "var").alias("__lex_only"))
            parts.append(sols.select(*sel))
        out = parts[0]
        for p_ in parts[1:]:
            out = out.unionByName(p_)
        return out.distinct()

    def _anti(self, df: DataFrame, dels: DataFrame) -> DataFrame:
        """Remove every row of ``df`` matching a delete row — ONE
        left-anti join: equi on (subject, predicate, object) with the
        rest residual.  Datatype / lang compare null-safely (a
        plain-literal delete must match a NULL datatype row, and must
        NOT match a typed one) UNLESS the delete row came from a
        variable object template (``__lex_only`` — lexical match, any
        datatype/lang); a NULL graph on the delete side is a wildcard
        matching any graph — the remove_triples convention."""
        d = dels.distinct().alias("__d")
        t = df.alias("__t")
        lex = (F.col("__d.__lex_only") if "__lex_only" in dels.columns
               else F.lit(False))
        cond = F.lit(True)
        for c in ("subject", "predicate", "object"):
            if c in dels.columns:
                cond = cond & (F.col(f"__t.{c}") == F.col(f"__d.{c}"))
        for c in ("obj_datatype", "obj_lang"):
            if c in self.cols and c in dels.columns:
                cond = cond & (lex | F.col(f"__t.{c}").eqNullSafe(
                    F.col(f"__d.{c}")))
        if "graph" in self.cols and "graph" in dels.columns:
            cond = cond & (F.col("__d.graph").isNull()
                           | (F.col("__t.graph") == F.col("__d.graph")))
        return t.join(d, cond, "left_anti")

    # -- group graph pattern --------------------------------------------
    # -- property-path evaluation ----------------------------------------

    def _graph_triples(self, g) -> DataFrame:
        df = self.triples
        if g is not None:
            if "graph" not in self.cols:
                raise ValueError("GRAPH pattern over a table with no "
                                 "graph column")
            if g[0] == "in":                     # FROM dataset restriction
                vals = list(g[1])
                df = df.where(F.col("graph").isin(vals) if vals
                              else F.lit(False))
            else:
                df = df.where(F.col("graph") == g[1])
        return df

    def _graph_nodes(self, g) -> DataFrame:
        """All terms of the (graph-restricted) store — the zero-length
        path domain (SPARQL 1.1 §9.3 ZeroOrMorePath/ZeroOrOnePath)."""
        t = self._graph_triples(g)
        return (t.select(F.explode(F.array("subject", "object")).alias("n"))
                .where(F.col("n").isNotNull()).distinct())

    def _identity_pairs(self, g) -> DataFrame:
        return self._graph_nodes(g).select(F.col("n").alias("s"),
                                           F.col("n").alias("o"))

    def _path_pairs(self, p, g) -> DataFrame:
        """Compile a path AST node to a DataFrame('s', 'o') of connected
        term pairs.  seq = pairwise join, alt = union (bag semantics,
        matching plain-BGP multiplicities), inv = swap; +/*/? return the
        DISTINCT pair set, as the spec defines them via ALP."""
        kind = p[0]
        if kind == "iri":
            return (self._graph_triples(g)
                    .where(F.col("predicate") == p[1])
                    .select(F.col("subject").alias("s"),
                            F.col("object").alias("o")))
        if kind == "inv":
            return self._path_pairs(p[1], g).select(
                F.col("o").alias("s"), F.col("s").alias("o"))
        if kind == "alt":
            out = None
            for q in p[1]:
                d = self._path_pairs(q, g)
                out = d if out is None else out.unionByName(d)
            return out
        if kind == "seq":
            out = None
            for q in p[1]:
                nxt = self._path_pairs(q, g)
                if out is None:
                    out = nxt
                else:
                    out = (out.alias("l").join(
                               nxt.alias("r"),
                               F.col("l.o") == F.col("r.s"))
                           .select(F.col("l.s").alias("s"),
                                   F.col("r.o").alias("o")))
            return out
        if kind == "opt":
            return (self._path_pairs(p[1], g)
                    .unionByName(self._identity_pairs(g)).distinct())
        if kind in ("plus", "star"):
            closure = self._transitive_closure(self._path_pairs(p[1], g),
                                               stats=self.closure_stats)
            if kind == "plus":
                return closure
            return closure.unionByName(self._identity_pairs(g)).distinct()
        if kind == "nps":
            fwd, inv = p[1], p[2]
            t = self._graph_triples(g)
            arms = []
            if fwd:
                arms.append(t.where(~F.col("predicate").isin(fwd))
                            .select(F.col("subject").alias("s"),
                                    F.col("object").alias("o")))
            if inv:
                arms.append(t.where(~F.col("predicate").isin(inv))
                            .select(F.col("object").alias("s"),
                                    F.col("subject").alias("o")))
            out = arms[0]
            for a in arms[1:]:
                out = out.unionByName(a)
            return out
        raise ValueError(f"unsupported path element {p!r}")

    @staticmethod
    def _transitive_closure(base: DataFrame, keyed: bool = False,
                            stats: dict | None = None) -> DataFrame:
        """Distinct-pair transitive closure by FRONTIER expansion: each
        round joins only the pairs discovered last round against the base
        edges, so total join work is O(|closure|) rather than
        O(rounds × |closure|), and rounds = graph diameter.  Per-round
        ``localCheckpoint`` truncates the growing lineage exactly like the
        alternating-star loop in operators/cc.py; on a hierarchy-shaped
        KG (type/subclass trees, the common ``+`` target) the frontier
        shrinks geometrically.

        ``keyed=True``: base carries a 'g' graph label and pairs compose
        within one graph (GRAPH ?var paths) — the label joins the key.
        ``stats``, if given, receives {'rounds': N} (bench hook)."""
        cols = ["g", "s", "o"] if keyed else ["s", "o"]
        jcond = (F.col("f.o") == F.col("b.s"))
        if keyed:
            jcond = (F.col("f.g") == F.col("b.g")) & jcond
        proj = ([F.col("f.g").alias("g")] if keyed else []) + \
            [F.col("f.s").alias("s"), F.col("b.o").alias("o")]
        base = (base.where(F.col("s").isNotNull() & F.col("o").isNotNull())
                .distinct().localCheckpoint(eager=True))
        # constraint propagation must be off inside the loop: Spark's
        # Union.rewriteConstraints hits "key not found: <attr>" when both
        # union children descend (via checkpointed anti-joins) from the
        # same base attributes — a planner bug this loop reliably
        # triggers; the setting is restored on exit
        spark = base.sparkSession
        saved = spark.conf.get("spark.sql.constraintPropagation.enabled",
                               "true")
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
        rounds = 0
        try:
            reach, frontier = base, base
            while True:
                new = (frontier.alias("f")
                       .join(base.alias("b"), jcond)
                       .select(*proj)
                       .distinct()
                       .join(reach, cols, "left_anti")
                       .localCheckpoint(eager=True))
                rounds += 1
                if new.isEmpty():
                    return reach
                reach = reach.union(new).localCheckpoint(eager=True)
                frontier = new
        finally:
            spark.conf.set("spark.sql.constraintPropagation.enabled", saved)
            if stats is not None:
                stats["rounds"] = rounds

    # -- graph-keyed path evaluation (GRAPH ?var) ----------------------
    # Same algebra as _path_pairs but every relation carries the graph
    # label: pairs compose / close WITHIN one named graph, the whole
    # per-graph family evaluated in ONE DataFrame keyed by 'g' (no
    # driver-side loop over graphs).  GRAPH ?var ranges over named
    # graphs only (SPARQL 1.1 §13.3), so 'g' is never NULL — which also
    # keeps the closure's ["g","s","o"] anti-join exact.

    def _named_triples(self) -> DataFrame:
        if "graph" not in self.cols:
            raise ValueError("GRAPH pattern over a table with no "
                             "graph column")
        return self.triples.where(F.col("graph").isNotNull())

    def _identity_pairs_var(self) -> DataFrame:
        t = self._named_triples()
        return (t.select(F.col("graph").alias("g"),
                         F.explode(F.array("subject", "object")).alias("n"))
                .where(F.col("n").isNotNull()).distinct()
                .select("g", F.col("n").alias("s"), F.col("n").alias("o")))

    def _path_pairs_var(self, p) -> DataFrame:
        """Compile a path AST node to ('g', 's', 'o'): connected pairs
        per named graph."""
        kind = p[0]
        if kind == "iri":
            return (self._named_triples()
                    .where(F.col("predicate") == p[1])
                    .select(F.col("graph").alias("g"),
                            F.col("subject").alias("s"),
                            F.col("object").alias("o")))
        if kind == "inv":
            return self._path_pairs_var(p[1]).select(
                "g", F.col("o").alias("s"), F.col("s").alias("o"))
        if kind == "alt":
            out = None
            for q in p[1]:
                d = self._path_pairs_var(q)
                out = d if out is None else out.unionByName(d)
            return out
        if kind == "seq":
            out = None
            for q in p[1]:
                nxt = self._path_pairs_var(q)
                if out is None:
                    out = nxt
                else:
                    out = (out.alias("l").join(
                               nxt.alias("r"),
                               (F.col("l.g") == F.col("r.g"))
                               & (F.col("l.o") == F.col("r.s")))
                           .select(F.col("l.g").alias("g"),
                                   F.col("l.s").alias("s"),
                                   F.col("r.o").alias("o")))
            return out
        if kind == "opt":
            return (self._path_pairs_var(p[1])
                    .unionByName(self._identity_pairs_var()).distinct())
        if kind in ("plus", "star"):
            closure = self._transitive_closure(
                self._path_pairs_var(p[1]), keyed=True,
                stats=self.closure_stats)
            if kind == "plus":
                return closure
            return closure.unionByName(
                self._identity_pairs_var()).distinct()
        if kind == "nps":
            fwd, inv = p[1], p[2]
            t = self._named_triples()
            arms = []
            if fwd:
                arms.append(t.where(~F.col("predicate").isin(fwd))
                            .select(F.col("graph").alias("g"),
                                    F.col("subject").alias("s"),
                                    F.col("object").alias("o")))
            if inv:
                arms.append(t.where(~F.col("predicate").isin(inv))
                            .select(F.col("graph").alias("g"),
                                    F.col("object").alias("s"),
                                    F.col("subject").alias("o")))
            out = arms[0]
            for a in arms[1:]:
                out = out.unionByName(a)
            return out
        raise ValueError(f"unsupported path element {p!r}")

    def _scan_path(self, pat) -> tuple[DataFrame, set[str]]:
        """Triple pattern whose predicate is a path: bind s/o against the
        evaluated pair relation.  Object literals match on lexical form
        (datatype/lang columns don't survive path algebra).  Under
        ``GRAPH ?var`` the pair relation is graph-keyed (one plan, no
        per-graph loop) and the graph variable binds the key column."""
        s, p, o, g = pat
        graph_var = g is not None and g[0] in ("var", "varin")
        df = self._path_pairs_var(p) if graph_var \
            else self._path_pairs(p, g)
        conds: list[Column] = []
        proj: dict[str, Column] = {}

        def bind(term, colname):
            if term[0] == "var":
                name = term[1]
                if name in proj:
                    conds.append(proj[name] == F.col(colname))
                else:
                    proj[name] = F.col(colname)
            else:
                conds.append(F.col(colname) == term[1])

        bind(s, "s")
        bind(o, "o")
        if graph_var:
            if g[0] == "varin":                  # GRAPH ?v under FROM NAMED
                vals = list(g[2])
                conds.append(F.col("g").isin(vals) if vals
                             else F.lit(False))
                bind(("var", g[1]), "g")
            else:
                bind(g, "g")
        for c in conds:
            df = df.where(c)
        if proj:
            return df.select(*[c.alias(n) for n, c in proj.items()]), \
                set(proj)
        return df.select(F.lit(1).alias("__const")).limit(1), set()

    def _scan(self, pat) -> tuple[DataFrame, set[str]]:
        s, p, o, g = pat
        if p[0] not in ("var", "iri", "lit"):
            return self._scan_path(pat)
        df = self.triples
        conds: list[Column] = []
        proj: dict[str, Column] = {}
        meta_proj: dict[str, Column] = {}

        def bind(term, colname, literal_pos=False):
            kind = term[0]
            if kind == "var":
                name = term[1]
                if name in proj:
                    conds.append(proj[name] == F.col(colname))
                elif name.startswith("__"):
                    raise ValueError(f"reserved variable name ?{name}")
                else:
                    proj[name] = F.col(colname)
                    if name in self._meta:
                        # metadata sidecars for introspected variables;
                        # first-binding position wins (joins coalesce)
                        null_s = F.lit(None).cast("string")
                        if literal_pos:
                            meta_proj[_meta_col(name, "dt")] = (
                                F.col("obj_datatype").cast("string")
                                if "obj_datatype" in self.cols else null_s)
                            meta_proj[_meta_col(name, "lang")] = (
                                F.col("obj_lang").cast("string")
                                if "obj_lang" in self.cols else null_s)
                            # "uri" sidecar = is-a-reference (IRI or
                            # blank node), not a literal
                            meta_proj[_meta_col(name, "uri")] = (
                                F.col("obj_is_uri").cast("boolean")
                                if "obj_is_uri" in self.cols
                                else F.col(colname).rlike(_URI_SHAPE)
                                | F.col(colname).startswith("_:"))
                        else:
                            # subject/predicate/graph positions hold IRIs
                            # or blank nodes, never literals — the "uri"
                            # sidecar means is-a-reference, so it is True
                            # here unconditionally; _introspect splits
                            # isIRI/isBLANK on the startswith("_:") check
                            meta_proj[_meta_col(name, "dt")] = null_s
                            meta_proj[_meta_col(name, "lang")] = null_s
                            meta_proj[_meta_col(name, "uri")] = F.lit(True)
            elif kind == "iri":
                conds.append(F.col(colname) == term[1])
            elif kind == "in":                   # dataset-restricted graph
                vals = list(term[1])
                conds.append(F.col(colname).isin(vals) if vals
                             else F.lit(False))
            elif kind == "varin":                # GRAPH ?v under FROM NAMED
                vals = list(term[2])
                conds.append(F.col(colname).isin(vals) if vals
                             else F.lit(False))
                bind(("var", term[1]), colname)
            else:                                # typed/plain literal
                _, lex, dt, lang = term
                conds.append(F.col(colname) == lex)
                if dt and "obj_datatype" in self.cols and literal_pos:
                    conds.append(F.col("obj_datatype") == dt)
                if lang and "obj_lang" in self.cols and literal_pos:
                    conds.append(F.col("obj_lang") == lang)

        bind(s, "subject")
        bind(p, "predicate")
        bind(o, "object", literal_pos=True)
        if g is not None:
            if "graph" not in self.cols:
                raise ValueError("GRAPH pattern over a table with no "
                                 "graph column")
            bind(g, "graph")
        for c in conds:
            df = df.where(c)
        if proj:
            return df.select(
                *[c.alias(n) for n, c in proj.items()],
                *[c.alias(n) for n, c in meta_proj.items()]), set(proj)
        # all-constant pattern: a 0/1-row existence relation
        return df.select(F.lit(1).alias("__const")).limit(1), set()

    def _join(self, left, lvars, right, rvars, how="inner"):
        keys = sorted(lvars & rvars)
        if left is None:
            return right, set(rvars)
        # a variable introspected AND bound on both sides carries the
        # same-named metadata sidecars on both: rename the right copy and
        # merge after the join.  First binding wins PER ROW as a unit —
        # the merge is gated on a left-presence flag (left var value
        # non-null), not a per-column coalesce, because NULL is a
        # legitimate metadata value (plain literal = NULL datatype/lang):
        # an independent coalesce would let a right typed binding
        # overwrite a left plain-literal's NULL datatype, or even mix
        # dt/lang/uri from different sides for one row.
        dup = [c for c in right.columns
               if c.startswith("__m_") and c in left.columns]
        dup_vars = sorted({c[len("__m_"):].rsplit("__", 1)[0] for c in dup})
        for v in dup_vars:
            left = left.withColumn("__lp_" + v, F.col(v).isNotNull())
        for c in dup:
            right = right.withColumnRenamed(c, "__r" + c)
        if not keys:
            if how == "left":
                # disjoint OPTIONAL: keep left rows even when the right
                # side is empty (a crossJoin would drop them)
                out = left.join(right, F.lit(True), "left")
            else:
                out = left.crossJoin(right)
        else:
            out = left.join(right, keys, how)
        for c in dup:
            v = c[len("__m_"):].rsplit("__", 1)[0]
            out = out.withColumn(
                c, F.when(F.col("__lp_" + v), F.col(c))
                    .otherwise(F.col("__r" + c))).drop("__r" + c)
        if dup_vars:
            out = out.drop(*["__lp_" + v for v in dup_vars])
        return out, lvars | rvars

    def _values_compat_join(self, df, bound, vdf, names):
        """Join a VALUES table containing UNDEF (NULL) cells with SPARQL
        solution-compatibility semantics: for each shared variable, a row
        pair is compatible when either side is unbound (NULL) or both
        values are equal; the merged binding coalesces bound-side-first.
        Variables new to the group come through as-is (NULL where
        UNDEF)."""
        if df is None:
            return vdf, set(names)
        shared = sorted(bound & set(names))
        for n in shared:
            vdf = vdf.withColumnRenamed(n, "__v_" + n)
        cond = F.lit(True)
        for n in shared:
            cond = cond & (F.col("__v_" + n).isNull()
                           | F.col(n).isNull()
                           | (F.col(n) == F.col("__v_" + n)))
        out = df.join(vdf, cond, "inner")
        for n in shared:
            out = out.withColumn(
                n, F.coalesce(F.col(n), F.col("__v_" + n))
            ).drop("__v_" + n)
        return out, bound | set(names)

    def _group(self, g: Group) -> tuple[DataFrame, set[str]]:
        """Build the group left-to-right, SPARQL algebra order
        (§18.2.2.6): each element joins/extends what came before it, so
        BIND-introduced variables become join keys for later OPTIONALs
        and patterns.  FILTERs scope to the whole group → applied last.
        UNDEF-bearing VALUES blocks are deferred (commutative join) and
        compatibility-joined just before the filters."""
        df, bound = None, set()
        pending_values: list = []
        for kind, payload in g.elements:
            if kind == "pattern":
                scan, vars_ = self._scan(payload)
                df, bound = self._join(df, bound, scan, vars_)
            elif kind == "subgroup":
                sdf, svars = self._group(payload)
                df, bound = self._join(df, bound, sdf, svars)
            elif kind == "service":
                # SPARQL 1.1 Federated Query (in-process): compile the
                # pattern against the registered endpoint's OWN triple
                # table via a child engine, then join the solution sets
                # — shared variables become equi-join keys exactly like
                # a subgroup, so Catalyst plans the federation join
                # (broadcast when one side is small).  SILENT + unknown
                # endpoint = the unit solution (§2.4: join identity).
                silent, ep, sub = payload

                def _svc_eval(src):
                    child = SparqlEngine(src, services=self.services)
                    child._meta = self._meta
                    child._now = getattr(self, "_now", None)
                    child.closure_stats = self.closure_stats
                    return child._group(sub)

                if ep[0] == "var":
                    # SERVICE ?ep { ... } — implementation-defined
                    # (SPARQL 1.1 Federated Query §2.4): the variable
                    # ranges over the REGISTERED endpoints, exactly the
                    # in-process analog of paths under GRAPH ?var — one
                    # compiled arm per endpoint with ?ep bound to its
                    # IRI, arms unioned (null-filled to the common
                    # variable set), then solution-joined, so an
                    # already-bound ?ep prunes via the equi-join.
                    # Sorted iteration keeps the plan deterministic.
                    arms = []
                    for iri in sorted(self.services):
                        adf, avars = _svc_eval(self.services[iri])
                        arms.append((adf.select(
                            F.lit(iri).alias(ep[1]), "*"),
                            avars | {ep[1]}))
                    if not arms:
                        # no registered endpoints: the variable has
                        # nothing to range over — empty solution set
                        # (join annihilator), never an error.  Compile
                        # the pattern against an EMPTY triple table so
                        # every inner variable is still bound (a later
                        # projection of one must see NULL-typed columns,
                        # not an unbound-variable error).
                        adf, avars = _svc_eval(self.triples.limit(0))
                        sdf = adf.select(
                            F.lit(None).cast("string").alias(ep[1]), "*")
                        df, bound = self._join(df, bound, sdf,
                                               avars | {ep[1]})
                        continue
                    uvars = set().union(*[v for _, v in arms])
                    parts = [adf.select(
                        "*", *[F.lit(None).cast("string").alias(m)
                               for m in sorted(uvars - avars)])
                        for adf, avars in arms]
                    sdf = parts[0]
                    for p_ in parts[1:]:
                        sdf = sdf.unionByName(p_, allowMissingColumns=True)
                    df, bound = self._join(df, bound, sdf, uvars)
                    continue
                iri = ep[1]
                src = self.services.get(iri)
                if src is None:
                    if not silent:
                        raise ValueError(
                            f"unknown SERVICE endpoint <{iri}> — "
                            "register its triple table in "
                            "SparqlEngine(services={iri: df}) (the "
                            "multi-graph manager does this for every "
                            "managed graph)")
                    continue
                sdf, svars = _svc_eval(src)
                df, bound = self._join(df, bound, sdf, svars)
            elif kind == "subselect":
                sdf = self._select(payload)
                df, bound = self._join(df, bound, sdf, set(sdf.columns))
            elif kind == "union":
                # arms are Groups or ("sq", parsed-select) subquery
                # wrappers — a subquery arm compiles independently and
                # contributes its projected columns as its variables
                adfs = []
                for a in payload:
                    if isinstance(a, tuple) and a[0] == "sq":
                        sdf = self._select(a[1])
                        adfs.append((sdf, {c for c in sdf.columns
                                           if not c.startswith("__")}))
                    else:
                        adfs.append(self._group(a))
                uvars = set().union(*[v for _, v in adfs])
                parts = []
                for adf, avars in adfs:
                    missing = sorted(uvars - avars)
                    parts.append(adf.select(
                        "*", *[F.lit(None).cast("string").alias(m)
                               for m in missing]))
                udf = parts[0]
                for p_ in parts[1:]:
                    # allowMissingColumns: metadata sidecars present in
                    # one arm only null-fill in the others
                    udf = udf.unionByName(p_, allowMissingColumns=True)
                df, bound = self._join(df, bound, udf, uvars)
            elif kind == "values":
                names, rows = payload
                # inline ground table — always tiny, broadcast the join
                vdf = F.broadcast(self.triples.sparkSession.createDataFrame(
                    rows, ", ".join(f"{n} string" for n in names)))
                if any(v is None for r in rows for v in r):
                    # UNDEF rows: SPARQL solution compatibility (§18.2) —
                    # an unbound (NULL) side matches anything and the
                    # merged binding takes the bound side's value.  An
                    # equi-join would drop those rows (SQL NULL never
                    # equals), so this block joins on an explicit
                    # null-tolerant condition — and is DEFERRED to the
                    # end of the group build: SPARQL Join is commutative,
                    # and applying the wildcard table last means every
                    # other pattern has already bound its variables
                    # normally (a NULL cell joined in the middle would
                    # hit the engine's equi-join deviation).  The VALUES
                    # table is inline-tiny, so the resulting broadcast
                    # nested-loop join is fine.
                    pending_values.append((vdf, names))
                else:
                    df, bound = self._join(df, bound, vdf, set(names))
            elif kind == "optional":
                df, bound = self._optional(df, bound, payload)
            elif kind == "minus":
                mdf, mvars = self._group(payload)
                keys = sorted(bound & mvars)
                if keys:  # disjoint-domain MINUS removes nothing
                    df = df.join(mdf.select(*keys).distinct(), keys,
                                 "left_anti")
            elif kind == "bind":
                expr, var = payload
                if df is None:
                    # group starting with BIND: extend the unit relation
                    df = self.triples.sparkSession.range(1).drop("id")
                if expr[0] == "func" and expr[1] == "IF" and \
                        expr[2][0][0] == "exists":
                    df = self._bind_if_exists(df, bound, expr, var)
                else:
                    df = df.withColumn(var, self._expr(expr, df, bound))
                    if var in self._meta:
                        df = self._bind_meta(df, var, expr)
                bound.add(var)
        for vdf, names in pending_values:
            df, bound = self._values_compat_join(df, bound, vdf, names)
        for flt in g.filters:
            if flt[0] == "exists":
                df = self._exists_join(df, bound, flt)
            else:
                df = df.where(self._expr(flt, df, bound))
        if df is None:
            raise ValueError("empty group pattern")
        return df, bound

    def _optional(self, df, bound, opt: Group):
        """SPARQL LeftJoin (§18.2.2.6): a FILTER inside OPTIONAL
        evaluates over the *joined* bindings — the spec's own example is
        ``{ ?x :p ?v OPTIONAL { ?x :q ?w FILTER(?v < ?w) } }``.  Filters
        fully bound inside the group apply group-locally (equivalent and
        cheaper); filters referencing left-side variables defer into the
        left-join condition (rows failing it keep the left bindings with
        the optional side nulled, never dropped).  EXISTS filters stay
        group-local — one that needs left bindings raises."""
        inner = Group(elements=opt.elements, filters=[])
        odf, ovars = self._group(inner)
        deferred = []
        for flt in opt.filters:
            if flt[0] == "exists":
                odf = self._exists_join(odf, ovars, flt)
            elif _expr_vars(flt) <= ovars:
                odf = odf.where(self._expr(flt, odf, ovars))
            else:
                deferred.append(flt)
        if not deferred:
            return self._join(df, bound, odf, ovars, how="left")
        if df is None:
            raise ValueError(
                "OPTIONAL filter references variables bound nowhere: "
                f"{sorted(_expr_vars(deferred[0]) - ovars)}")
        # conditional left join: rename the shared keys on the optional
        # side (keeps every column reference unambiguous), equi-join on
        # them plus the deferred filters as residual conditions
        keys = sorted(bound & ovars)
        right = odf
        for k in keys:
            right = right.withColumnRenamed(k, f"__opt_{k}")
        dup = [c for c in right.columns
               if c.startswith("__m_") and c in df.columns]
        for c in dup:
            right = right.withColumnRenamed(c, "__r" + c)
        cond = F.lit(True)
        for k in keys:
            cond = cond & (F.col(k) == F.col(f"__opt_{k}"))
        jbound = bound | ovars
        # deferred filters compile without a single DataFrame in hand;
        # introspection still needs to see which sidecar columns exist
        # across the two sides (post-rename), so hand _expr a view of
        # the joined column namespace
        jview = SimpleNamespace(columns=[*df.columns, *right.columns])
        for flt in deferred:
            cond = cond & self._expr(flt, jview, jbound)
        out = df.join(right, cond, "left").drop(
            *[f"__opt_{k}" for k in keys])
        for c in dup:
            out = out.withColumn(
                c, F.coalesce(F.col(c), F.col("__r" + c))).drop("__r" + c)
        return out, bound | ovars

    def _exists_join(self, df, bound, flt) -> DataFrame:
        _, positive, sub = flt
        sdf, svars = self._group(sub)
        keys = sorted(bound & svars)
        how = "left_semi" if positive else "left_anti"
        if not keys:
            # uncorrelated EXISTS: keep all or nothing
            marker = sdf.limit(1)
            return df.crossJoin(marker) if positive else \
                df.join(marker.select(F.lit(1).alias("__e")),
                        F.lit(True), "left_anti")
        return df.join(sdf.select(*keys).distinct(), keys, how)

    # -- expressions ----------------------------------------------------
    def _expr(self, e, df, bound) -> Column:
        kind = e[0]
        if kind == "var":
            if e[1] not in bound:
                raise ValueError(f"unbound variable ?{e[1]} in expression")
            return F.col(e[1])
        if kind == "iri":
            return F.lit(e[1])
        if kind == "lit":
            return F.lit(e[1])
        if kind == "and":
            return self._expr(e[1], df, bound) & self._expr(e[2], df, bound)
        if kind == "or":
            return self._expr(e[1], df, bound) | self._expr(e[2], df, bound)
        if kind == "not":
            return ~self._expr(e[1], df, bound)
        if kind == "cmp":
            op, a, b = e[1], e[2], e[3]
            numeric = (a[0] == "lit" and a[2] in _NUMERIC_DTS) or \
                      (b[0] == "lit" and b[2] in _NUMERIC_DTS)
            ca, cb = self._expr(a, df, bound), self._expr(b, df, bound)
            if numeric:
                ca = ca.try_cast("double")
                cb = cb.try_cast("double")
            return {"=": ca == cb, "!=": ca != cb, "<": ca < cb,
                    ">": ca > cb, "<=": ca <= cb, ">=": ca >= cb}[op]
        if kind == "in":
            target = self._expr(e[1], df, bound)
            cond = F.lit(False)
            for x in e[2]:
                cond = cond | (target == self._expr(x, df, bound))
            return cond
        if kind == "exists":
            raise ValueError("EXISTS as a bare value expression is only "
                             "supported in FILTER position or inside "
                             "IF(EXISTS{...}, ..., ...)")
        if kind == "func":
            name, args = e[1], e[2]
            cargs = [self._expr(a, df, bound) for a in args]
            if name == "CONTAINS":
                return cargs[0].contains(cargs[1])
            if name == "STRSTARTS":
                return cargs[0].startswith(cargs[1])
            if name == "STRENDS":
                return cargs[0].endswith(cargs[1])
            if name == "CONCAT":
                return F.concat(*cargs)
            if name == "COALESCE":
                return F.coalesce(*cargs)
            if name == "SUBSTR":
                # SPARQL SUBSTR is 1-based like Spark's substr; both
                # position args take Columns, so non-literals work too
                length = cargs[2] if len(cargs) == 3 \
                    else F.lit(2 ** 31 - 1)
                return cargs[0].substr(cargs[1].cast("int"),
                                       length.cast("int"))
            if name in ("STRBEFORE", "STRAFTER"):
                pat = e[2][1]
                if pat[0] != "lit":
                    raise ValueError(f"{name} separator must be a literal")
                sep = pat[1]
                if not sep:                  # empty separator, per spec
                    return F.lit("") if name == "STRBEFORE" else cargs[0]
                pos = F.locate(sep, cargs[0])     # 1-based; 0 = absent
                hit = pos > 0
                before = cargs[0].substr(F.lit(1), pos - 1)
                after = cargs[0].substr(pos + len(sep),
                                        F.lit(2 ** 31 - 1))
                return F.when(hit, before if name == "STRBEFORE"
                              else after).otherwise(F.lit(""))
            if name == "REPLACE":
                pat = e[2][1]
                if pat[0] != "lit":
                    raise ValueError("REPLACE pattern must be a literal")
                rx = pat[1]
                if len(e[2]) == 4:
                    flags = e[2][3]
                    if flags[0] == "lit" and "i" in flags[1]:
                        rx = "(?i)" + rx
                repl = e[2][2]
                if repl[0] != "lit":
                    raise ValueError(
                        "REPLACE replacement must be a literal")
                return F.regexp_replace(cargs[0], rx, repl[1])
            if name in ("ABS", "ROUND", "CEIL", "FLOOR"):
                n = cargs[0].try_cast("double")
                return {"ABS": F.abs(n), "ROUND": F.round(n, 0),
                        "CEIL": F.ceil(n), "FLOOR": F.floor(n)}[name]
            if name == "STRLEN":
                return F.length(cargs[0])
            if name == "LCASE":
                return F.lower(cargs[0])
            if name == "UCASE":
                return F.upper(cargs[0])
            if name == "STR":
                return cargs[0]                  # strings all the way down
            if name == "BOUND":
                return cargs[0].isNotNull()
            if name == "REGEX":
                pat = e[2][1]
                if pat[0] != "lit":
                    raise ValueError("REGEX pattern must be a literal")
                rx = pat[1]
                if len(e[2]) == 3:
                    flags = e[2][2]
                    if flags[0] == "lit" and "i" in flags[1]:
                        rx = "(?i)" + rx
                return cargs[0].rlike(rx)
            if name == "IF":
                return F.when(cargs[0], cargs[1]).otherwise(cargs[2])
            if name == "MD5":
                return F.md5(cargs[0].cast("binary"))
            if name == "SHA1":
                return F.sha1(cargs[0].cast("binary"))
            if name in ("SHA256", "SHA384", "SHA512"):
                return F.sha2(cargs[0].cast("binary"), int(name[3:]))
            if name == "ENCODE_FOR_URI":
                # Spark's url_encode is form-encoding; patch the three
                # spots where RFC 3986 (SPARQL's rule: unreserved =
                # ALPHA / DIGIT / "-" / "." / "_" / "~") disagrees
                enc = F.url_encode(cargs[0])
                enc = F.replace(enc, F.lit("+"), F.lit("%20"))
                enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
                return F.replace(enc, F.lit("%7E"), F.lit("~"))
            if name in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES",
                        "SECONDS", "TZ"):
                # component extraction is LEXICAL on the store's
                # canonical ISO dateTime form — no to_timestamp, so the
                # session timezone can never shift the literal's own
                # fields (SPARQL operates on the literal's components)
                rx = {"YEAR": r"^(-?\d{4,})-",
                      "MONTH": r"^-?\d{4,}-(\d{2})-",
                      "DAY": r"^-?\d{4,}-\d{2}-(\d{2})",
                      "HOURS": r"[T ](\d{2}):",
                      "MINUTES": r"[T ]\d{2}:(\d{2})",
                      "SECONDS": r"[T ]\d{2}:\d{2}:(\d{2}(?:\.\d+)?)",
                      "TZ": r"(Z|[+-]\d{2}:\d{2})$"}[name]
                part = F.regexp_extract(cargs[0], rx, 1)
                if name == "TZ":
                    return part              # "" when no timezone, per spec
                if name == "SECONDS":
                    return part.try_cast("double")
                return part.try_cast("int")
            if name in ("IRI", "URI", "STRLANG", "STRDT"):
                # term constructors: the VALUE is the lexical form (the
                # engine's string model); the constructed term's
                # metadata materializes only when the surrounding
                # BIND(... AS ?v) target is introspected (_bind_meta).
                # BASE applies to parsed IRI tokens (_resolve); IRI()
                # over a computed string still treats its argument as
                # absolute (documented narrow limitation).
                return cargs[0]
            if name in _INTROSPECT:
                return self._introspect(name, e[2][0], df)
            if name == "SAMETERM":
                # RDF-term identity (§17.4.1.8): canonical term keys
                # built from the metadata sidecars (kind | datatype |
                # lang | lexical); unbound argument → NULL (error)
                return self._term_key(e[2][0], df) == \
                    self._term_key(e[2][1], df)
            if name == "ISNUMERIC":
                return self._is_numeric(e[2][0], df)
            if name == "TIMEZONE":
                # tz offset → canonical xsd:dayTimeDuration lexical form
                # ("-05:00" → "-PT5H", "Z" → "PT0S"); no offset = error
                tz = F.regexp_extract(cargs[0],
                                      r"(Z|[+-]\d{2}:\d{2})$", 1)
                hh = F.substring(tz, 2, 2).try_cast("int")
                mm = F.substring(tz, 5, 2).try_cast("int")
                body = F.concat(
                    F.when(hh > 0, F.concat(hh.cast("string"),
                                            F.lit("H"))).otherwise(F.lit("")),
                    F.when(mm > 0, F.concat(mm.cast("string"),
                                            F.lit("M"))).otherwise(F.lit("")))
                sign = F.when(tz.startswith("-"), F.lit("-")) \
                    .otherwise(F.lit(""))
                return (F.when(tz == "", F.lit(None).cast("string"))
                        .when((tz == "Z") | ((hh == 0) & (mm == 0)),
                              F.lit("PT0S"))
                        .otherwise(F.concat(sign, F.lit("PT"), body)))
            if name == "CAST":
                return self._xsd_cast(e[2][0][1], cargs[1])
            if name == "NOW":
                # fixed for the whole query per §17.4.5.1 — captured
                # once per engine call (see _now_lit)
                return F.lit(self._now_lit())
            if name == "RAND":
                return F.rand()
            if name == "UUID":
                return F.concat(F.lit("urn:uuid:"), F.expr("uuid()"))
            if name == "STRUUID":
                return F.expr("uuid()")
            if name == "BNODE":
                return F.concat(F.lit("_:b"),
                                F.expr("replace(uuid(), '-', '')"))
            if name == "LANGMATCHES":
                rng_e = e[2][1]
                if rng_e[0] != "lit":
                    raise ValueError("LANGMATCHES range must be a literal")
                rng = rng_e[1]
                lang_c = cargs[0]
                if rng == "*":
                    return lang_c != ""
                low = F.lower(lang_c)
                # RFC 4647 basic filtering: exact tag or prefix + "-"
                return (low == rng.lower()) | \
                    low.startswith(rng.lower() + "-")
        raise ValueError(f"unsupported expression {e!r}")

    def _bind_meta(self, df, var: str, expr) -> DataFrame:
        """Metadata sidecars for an introspected BIND target: copied
        from the source variable for a plain copy, static for constant
        terms and the term constructors IRI()/URI()/STRLANG/STRDT,
        simple-literal for every other computed expression."""
        null_s = F.lit(None).cast("string")
        dt, lang, uri = null_s, null_s, F.lit(False)
        if expr[0] == "var" and _meta_col(expr[1], "dt") in df.columns:
            dt = F.col(_meta_col(expr[1], "dt"))
            lang = F.col(_meta_col(expr[1], "lang"))
            uri = F.col(_meta_col(expr[1], "uri"))
        elif expr[0] == "var":
            # copying a sidecar-less variable: keep the same shape
            # heuristic its direct introspection would use
            src = F.col(expr[1])
            uri = src.rlike(_URI_SHAPE) | src.startswith("_:")
        elif expr[0] == "iri":
            uri = F.lit(True)
        elif expr[0] == "lit":
            _, _lex, dt0, lang0 = expr
            dt = F.lit(dt0) if dt0 else null_s
            lang = F.lit(lang0) if lang0 else null_s
        elif expr[0] == "func":
            nm = expr[1]
            if nm in ("IRI", "URI"):
                uri = F.lit(True)
            elif nm == "STRLANG":
                tag = expr[2][1]
                if tag[0] != "lit":
                    raise ValueError("STRLANG tag must be a literal")
                lang = F.lit(tag[1])
            elif nm == "STRDT":
                dte = expr[2][1]
                if dte[0] != "iri":
                    raise ValueError("STRDT datatype must be an IRI")
                dt = F.lit(dte[1])
            elif nm == "CAST":
                dt = F.lit(expr[2][0][1])
            elif nm == "NOW":
                dt = F.lit(XSD + "dateTime")
            elif nm in ("UUID", "BNODE"):
                uri = F.lit(True)
        return (df.withColumn(_meta_col(var, "dt"), dt)
                .withColumn(_meta_col(var, "lang"), lang)
                .withColumn(_meta_col(var, "uri"), uri))

    def _introspect(self, name: str, arg, df) -> Column:
        """LANG / DATATYPE / isIRI / isURI / isLiteral / isBlank over a
        variable (via its metadata sidecars) or a constant term.

        Documented model: a variable bound only where no metadata exists
        (property-path objects, VALUES rows, BIND/subquery results) is a
        simple literal — LANG "" , DATATYPE xsd:string, isLiteral true;
        isIRI falls back to the engine-wide IRI shape heuristic
        (operators/store.py's obj_is_uri fallback)."""
        if arg[0] == "lit":
            _, lex, dt, lang = arg
            return {
                "LANG": F.lit(lang or ""),
                "DATATYPE": F.lit(
                    dt or (RDF_LANGSTRING if lang else XSD_STRING)),
                "ISIRI": F.lit(False), "ISURI": F.lit(False),
                "ISBLANK": F.lit(False), "ISLITERAL": F.lit(True),
            }[name]
        if arg[0] == "iri":
            if name in ("ISIRI", "ISURI"):
                return F.lit(True)
            if name in ("ISLITERAL", "ISBLANK"):
                return F.lit(False)
            # LANG/DATATYPE of an IRI is a type error → NULL (errors are
            # NULL in this engine: FILTER drops, BIND leaves unbound)
            return F.lit(None).cast("string")
        v = arg[1]
        val = F.col(v)
        has = df is not None and _meta_col(v, "dt") in df.columns
        if not has:
            heur_uri = val.rlike(_URI_SHAPE)
            return {
                "LANG": F.when(val.isNotNull(), F.lit("")),
                "DATATYPE": F.when(val.isNotNull(), F.lit(XSD_STRING)),
                "ISIRI": heur_uri, "ISURI": heur_uri,
                "ISBLANK": val.startswith("_:"),
                "ISLITERAL": val.isNotNull() & ~heur_uri
                & ~val.startswith("_:"),
            }[name]
        dt_c = F.col(_meta_col(v, "dt"))
        lang_c = F.col(_meta_col(v, "lang"))
        uri_c = F.coalesce(F.col(_meta_col(v, "uri")), F.lit(False))
        is_blank = uri_c & val.startswith("_:")
        is_iri = uri_c & ~val.startswith("_:")
        if name in ("ISIRI", "ISURI"):
            return F.when(val.isNotNull(), is_iri)
        if name == "ISBLANK":
            return F.when(val.isNotNull(), is_blank)
        if name == "ISLITERAL":
            return F.when(val.isNotNull(), ~uri_c)
        lit_dt = F.coalesce(
            dt_c,
            F.when(lang_c.isNotNull() & (lang_c != ""),
                   F.lit(RDF_LANGSTRING)).otherwise(F.lit(XSD_STRING)))
        if name == "DATATYPE":
            return F.when(val.isNotNull() & ~uri_c, lit_dt)
        # LANG: "" for literals without a tag; NULL (error) for IRIs
        return F.when(val.isNotNull() & ~uri_c,
                      F.coalesce(lang_c, F.lit("")))

    def _term_key(self, arg, df) -> Column:
        """Canonical term-identity key for sameTerm: ``R|<lex>`` for
        references (IRIs / blank nodes), ``L|<dt>|<lang>|<lex>`` for
        literals, with the same effective-datatype and shape-heuristic
        fallbacks as _introspect.  NULL (error) when unbound."""
        if arg[0] == "lit":
            _, lex, dt, lang = arg
            eff = dt or (RDF_LANGSTRING if lang else XSD_STRING)
            return F.lit(f"L|{eff}|{lang or ''}|{lex}")
        if arg[0] == "iri":
            return F.lit("R|" + arg[1])
        v = arg[1]
        val = F.col(v)
        if df is not None and _meta_col(v, "dt") in df.columns:
            dt_c = F.col(_meta_col(v, "dt"))
            lang_c = F.col(_meta_col(v, "lang"))
            uri_c = F.coalesce(F.col(_meta_col(v, "uri")), F.lit(False))
            eff = F.coalesce(
                dt_c, F.when(lang_c.isNotNull() & (lang_c != ""),
                             F.lit(RDF_LANGSTRING))
                .otherwise(F.lit(XSD_STRING)))
            key = F.when(uri_c, F.concat(F.lit("R|"), val)).otherwise(
                F.concat(F.lit("L|"), eff, F.lit("|"),
                         F.coalesce(lang_c, F.lit("")), F.lit("|"), val))
        else:
            heur = val.rlike(_URI_SHAPE) | val.startswith("_:")
            key = F.when(heur, F.concat(F.lit("R|"), val)).otherwise(
                F.concat(F.lit(f"L|{XSD_STRING}||"), val))
        return F.when(val.isNotNull(), key)

    def _is_numeric(self, arg, df) -> Column:
        """isNumeric (§17.4.2.4): literal with a numeric datatype.
        Sidecar-less bindings follow the engine's simple-literal model
        (datatype xsd:string) → false."""
        if arg[0] == "lit":
            return F.lit(arg[2] in _NUMERIC_DTS)
        if arg[0] == "iri":
            return F.lit(False)
        v = arg[1]
        val = F.col(v)
        if df is not None and _meta_col(v, "dt") in df.columns:
            uri_c = F.coalesce(F.col(_meta_col(v, "uri")), F.lit(False))
            num = F.coalesce(
                F.col(_meta_col(v, "dt")).isin(list(_NUMERIC_DTS)),
                F.lit(False))
            return F.when(val.isNotNull(), ~uri_c & num)
        return F.when(val.isNotNull(), F.lit(False))

    def _xsd_cast(self, dt: str, col: Column) -> Column:
        """XPath constructor cast (§17.5) in the engine's string data
        model: validate/normalize the lexical form, NULL (error) on
        failure.  The produced term's datatype materializes through
        _bind_meta when the BIND target is introspected.  Lexical
        canonical forms follow Spark's cast (e.g. double 42 → "42.0"),
        a documented deviation from XSD canonical mapping."""
        local = dt.rsplit("#", 1)[-1]
        if local in ("integer", "long", "int", "short", "byte",
                     "nonNegativeInteger", "positiveInteger",
                     "unsignedInt", "unsignedLong"):
            return col.try_cast("long").cast("string")
        if local in ("decimal", "double", "float"):
            return col.try_cast("double").cast("string")
        if local == "string":
            return col.cast("string")
        if local == "boolean":
            return (F.when(col.isin("true", "1"), F.lit("true"))
                    .when(col.isin("false", "0"), F.lit("false"))
                    .otherwise(F.lit(None).cast("string")))
        if local in ("dateTime", "date"):
            shape = (r"^-?\d{4,}-\d{2}-\d{2}" +
                     (r"[T ]\d{2}:\d{2}:\d{2}" if local == "dateTime"
                      else r"$"))
            return F.when(col.rlike(shape), col)
        raise ValueError(f"unsupported constructor cast <{dt}>")

    def _now_lit(self) -> str:
        """NOW(): one timestamp per engine call (query/update), per
        §17.4.5.1 'the same value for the entire query execution'."""
        if getattr(self, "_now", None) is None:
            from datetime import datetime, timezone
            self._now = datetime.now(timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
        return self._now

    def _bind_if_exists(self, df, bound, expr, var) -> DataFrame:
        """``BIND(IF(EXISTS{...}, t, f) AS ?v)`` per-row: left-join a
        distinct marker on the shared variables (must be correlated),
        then flag → t/f.  One extra join, no per-row subquery."""
        args = expr[2]
        _, positive, sub = args[0]
        sdf, svars = self._group(sub)
        keys = sorted(bound & svars)
        if not keys:
            raise ValueError("IF(EXISTS{...}) must share a variable with "
                             "the outer pattern")
        marker = sdf.select(*keys).distinct().withColumn(
            "__exists", F.lit(1))
        joined = df.join(marker, keys, "left")
        flag = F.col("__exists").isNotNull()
        if not positive:
            flag = ~flag
        t = self._expr(args[1], joined, bound)
        f_ = self._expr(args[2], joined, bound)
        return joined.withColumn(var, F.when(flag, t).otherwise(f_)) \
            .drop("__exists")

    # -- SELECT assembly -------------------------------------------------
    def _select(self, q) -> DataFrame:
        df, bound = self._group(q["where"])
        proj = q["proj"]
        has_agg = any(p[0] == "expr" and p[1][0] == "agg" for p in proj)
        if has_agg or q["group_by"]:
            gb = q["group_by"]
            aggs, names, sel = [], [], []
            for p in proj:
                if p[0] == "plain":
                    if p[1] not in gb:
                        raise ValueError(
                            f"?{p[1]} must appear in GROUP BY")
                    sel.append(p[1])
                elif p[0] == "expr":
                    if p[1][0] != "agg":
                        raise ValueError(
                            "a projection expression alongside GROUP BY "
                            "must be an aggregate (BIND the expression "
                            "in the WHERE group instead)")
                    aggs.append(self._agg(p[1], df, bound).alias(p[2]))
                    names.append(p[2])
                    sel.append(p[2])
                else:
                    raise ValueError("SELECT * cannot mix with aggregates")
            # HAVING and ORDER BY: hoist each aggregate into a hidden agg
            # column, apply the constraint / sort post-agg, then the
            # final projection (in the query's own column order) drops
            # the hidden columns
            hidden: list = []
            having = [self._hoist_aggs(e, hidden)
                      for e in (q.get("having") or [])]
            order_by = [(self._hoist_aggs(e, hidden), asc)
                        for e, asc in (q.get("order_by") or [])]
            aggs += [self._agg(a, df, bound).alias(nm) for nm, a in hidden]
            out = (df.groupBy(*gb) if gb else df.groupBy()).agg(*aggs)
            hbound = set(gb) | set(names) | {nm for nm, _ in hidden}
            for e in having:
                out = out.where(self._expr(e, out, hbound))
            if q["distinct"]:
                # DISTINCT projects first; ORDER BY may then only use
                # projected variables (SPARQL §18.2.1.4)
                out = out.select(*sel) if sel else out
                return self._modifiers(out.distinct(), q,
                                       set(out.columns))
            out = self._modifiers(out, dict(q, order_by=order_by), hbound)
            return out.select(*sel) if sel else out
        if q.get("having"):
            raise ValueError("HAVING requires GROUP BY or an "
                             "aggregate projection")
        cols = []
        for p in proj:
            if p[0] == "star":
                cols.extend(sorted(bound))
            elif p[0] == "plain":
                if p[1] not in bound:
                    raise ValueError(f"?{p[1]} is not bound")
                cols.append(p[1])
            else:
                df = df.withColumn(p[2], self._expr(p[1], df, bound))
                bound.add(p[2])
                cols.append(p[2])
        if q["distinct"]:
            out = df.select(*cols) if cols else df
            return self._modifiers(out.distinct(), q, set(out.columns))
        # no DISTINCT: order/slice BEFORE projecting, so ORDER BY may use
        # any in-scope variable, projected or not (§18.2.1.4 order)
        df = self._modifiers(df, q, bound)
        return df.select(*cols) if cols else df

    def _hoist_aggs(self, e, sink: list):
        """Rewrite ("agg", ...) subtrees of a HAVING constraint to fresh
        hidden-column var references, collecting (name, agg) into sink."""
        if not isinstance(e, tuple):
            return e
        if e[0] == "agg":
            nm = f"__hav{len(sink)}"
            sink.append((nm, e))
            return ("var", nm)
        if e[0] in ("and", "or"):
            return (e[0], self._hoist_aggs(e[1], sink),
                    self._hoist_aggs(e[2], sink))
        if e[0] == "not":
            return ("not", self._hoist_aggs(e[1], sink))
        if e[0] == "cmp":
            return ("cmp", e[1], self._hoist_aggs(e[2], sink),
                    self._hoist_aggs(e[3], sink))
        if e[0] == "in":
            return ("in", self._hoist_aggs(e[1], sink),
                    [self._hoist_aggs(x, sink) for x in e[2]])
        if e[0] == "func":
            return ("func", e[1],
                    [self._hoist_aggs(x, sink) for x in e[2]])
        return e

    def _agg(self, a, df, bound) -> Column:
        _, name, distinct, arg, sep = a
        if name == "COUNT":
            if arg == ("star",):
                return F.count(F.lit(1))
            c = self._expr(arg, df, bound)
            return F.count_distinct(c) if distinct else F.count(c)
        c = self._expr(arg, df, bound)
        if name == "SAMPLE":
            # spec says "an arbitrary value from the group"; a
            # distributed engine must still be deterministic across
            # retries/partitionings, so: the lexical minimum
            return F.min(c)
        if name == "GROUP_CONCAT":
            base = F.array_sort(F.collect_set(c) if distinct
                                else F.collect_list(c))
            return F.array_join(base, sep)
        if name in ("MIN", "MAX"):
            # SPARQL MIN/MAX order by "<", which covers strings and
            # dateTimes, not just numbers.  Values are strings (the
            # engine's data model): order numerically when EVERY non-null
            # input casts (returning the original lexical form of the
            # winning element, tie-broken lexically — deterministic),
            # else lexically — the same convention FILTER comparisons use.
            num = c.try_cast("double")
            pair = F.when(c.isNotNull(),
                          F.struct(num.alias("n"), c.alias("v")))
            pick = (F.min(pair) if name == "MIN" else F.max(pair))["v"]
            all_num = F.count(c) == F.count(num)
            lex = F.min(c) if name == "MIN" else F.max(c)
            return F.when(all_num, pick).otherwise(lex)
        # SUM/AVG are numeric by definition: a BOUND non-castable value
        # is a type error, and errors propagate through the aggregate —
        # the whole group's result is unbound (SPARQL 1.1 §18.5.1.5;
        # pyoxigraph agrees).  Unbound (NULL) inputs are skipped, not
        # errored — a documented deviation kept for Spark-agg symmetry
        # with COUNT/MIN/MAX.
        num = c.try_cast("double")
        all_num = F.count(c) == F.count(num)
        return F.when(all_num, {"SUM": F.sum(num),
                                "AVG": F.avg(num)}[name])

    def _modifiers(self, df, q, bound) -> DataFrame:
        if q.get("order_by"):
            keys = []
            for expr, asc in q["order_by"]:
                c = self._expr(expr, df, bound)
                keys.append(c.asc() if asc else c.desc())
            df = df.orderBy(*keys)
        if q.get("offset"):
            df = df.offset(q["offset"])
        if q.get("limit") is not None:
            df = df.limit(q["limit"])
        return df
