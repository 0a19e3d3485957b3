"""Differential battery for the SPARQL front-end: seeded random queries
(BGP + GRAPH + FILTER + OPTIONAL + UNION + MINUS + BIND + DISTINCT +
ORDER/LIMIT) are evaluated BOTH by the Spark engine (sparql.py compiles
them to one DataFrame plan) and by an independent naive
solution-mapping evaluator written straight from the SPARQL algebra
(§18.2) — results must agree as multisets (ordered lists when the query
carries ORDER BY + LIMIT).

The generator stays inside the engine's documented data model so the
two implementations are comparable by construction:
- UNION arms bind the same variable set (no partially-bound join keys:
  the engine joins on string equality, where NULL never matches — the
  documented deviation from spec "compatibility");
- MINUS patterns anchor on base-bound (never optional) variables;
- numeric FILTER comparisons only over the all-numeric predicate
  (matching the engine's literal-driven try_cast rule);
- OPTIONAL groups come last among the block extras and may carry a
  filter referencing left-side variables — the LeftJoin(expr) path;
- ORDER BY covers every projected variable ascending (nulls first on
  both sides), so the ordering is total and LIMIT is well-defined.

Failures print the query text + seed, so any divergence is replayable.
"""

import hashlib
import random
import re
import urllib.parse
from collections import Counter

import pytest

from kgraphmemory_spark.sparql import SparqlEngine

SCHEMA = ("subject string, predicate string, object string, "
          "obj_datatype string, obj_lang string, graph string")
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

SUBJECTS = [f"urn:s{i}" for i in range(8)]
PREDS = [f"urn:p{i}" for i in range(4)]
NUM_PRED = "urn:num"
LITS = ["alpha", "beta", "gamma", "delta", "epsilon"]
IRIS = [f"urn:o{i}" for i in range(5)]
GRAPHS = ["urn:g0", "urn:g1"]
# lang-tagged literal values — value↔tag is a bijection, so term
# metadata is a pure function of the lexical form and the naive
# evaluator can introspect via _meta_of without tracking metadata
# through joins (the engine's left-wins coalesce picks the same answer)
TAGGED = {"chat": "fr", "cat": "en", "katze": "de-AT", "gato": "es"}
XSD_STRING_DT = "http://www.w3.org/2001/XMLSchema#string"
RDF_LS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _data(rng: random.Random) -> list[tuple]:
    rows = []
    for _ in range(110):
        s = rng.choice(SUBJECTS)
        if rng.random() < 0.25:
            rows.append((s, NUM_PRED, str(rng.randint(0, 9)), XSD_INT,
                         None, rng.choice(GRAPHS)))
        else:
            p = rng.choice(PREDS)
            o = rng.choice(LITS + IRIS + sorted(TAGGED))
            rows.append((s, p, o, None, TAGGED.get(o),
                         rng.choice(GRAPHS)))
    return sorted(set(rows))


def _meta_of(v):
    """value → (datatype, lang, is_ref); total function of the value by
    construction of the data tables above."""
    if v is None:
        return (None, None, None)
    if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", v):
        return (None, None, True)
    if v in TAGGED:
        return (None, TAGGED[v], False)
    if v.isdigit():
        return (XSD_INT, None, False)
    return (None, None, False)


# ---------------------------------------------------------------- naive
# evaluator: solution mappings as dicts, straight from the algebra

def _match(pattern, row, graph=None):
    """triple pattern × data row → binding dict or None."""
    if graph is not None and row[5] != graph:
        return None
    out = {}
    for term, val in zip(pattern, row):
        kind, v = term
        if kind == "var":
            if v in out and out[v] != val:
                return None
            out[v] = val
        elif v != val:
            return None
    return out


def _compatible(m1, m2):
    return all(m1[k] == m2[k] for k in m1.keys() & m2.keys())


def _eval_bgp(patterns, rows, graphs=None):
    sols = [{}]
    for i, pat in enumerate(patterns):
        g = graphs[i] if graphs else None
        nxt = []
        for mu in sols:
            for row in rows:
                b = _match(pat, row, g)
                if b is not None and _compatible(mu, b):
                    nxt.append({**mu, **b})
        sols = nxt
    return sols


_BIND_IMPL = {
    "LCASE": lambda v: v.lower(),
    "UCASE": lambda v: v.upper(),
    "MD5": lambda v: hashlib.md5(v.encode()).hexdigest(),
    "SHA1": lambda v: hashlib.sha1(v.encode()).hexdigest(),
    "SHA256": lambda v: hashlib.sha256(v.encode()).hexdigest(),
    "ENCODE_FOR_URI": lambda v: urllib.parse.quote(v, safe="-._~"),
}


def _eval_filter(flt, mu):
    """(op, var, rhs, numeric) — SPARQL filter: unbound/error → False."""
    op, var, rhs, numeric = flt
    if var not in mu or mu[var] is None:
        return False
    v = mu[var]
    if op in ("lang", "isiri", "dtype"):
        dt, lang_, ref = _meta_of(v)
        if op == "isiri":
            return ref if rhs else not ref
        if ref:              # LANG/DATATYPE of an IRI → error → False
            return False
        if op == "lang":
            t = (lang_ or "").lower()
            if rhs == "*":
                return t != ""
            return t == rhs.lower() or t.startswith(rhs.lower() + "-")
        return (dt or (RDF_LS if lang_ else XSD_STRING_DT)) == rhs
    if op == "sameterm":
        # value→metadata is a bijection in this dataset, so term
        # identity degenerates to value equality for the naive side;
        # the ENGINE computes it from sidecars — that asymmetry is the
        # test (sidecar propagation through joins/optional/union)
        return v == rhs
    if op == "isnumeric":
        dt, _lang, ref = _meta_of(v)
        isnum = (not ref) and dt == XSD_INT
        return isnum if rhs else not isnum
    if op == "contains":
        return rhs in v
    if numeric:
        try:
            v, rhs = float(v), float(rhs)
        except ValueError:
            return False
    return {"=": v == rhs, "!=": v != rhs,
            "<": v < rhs, ">": v > rhs}[op]


def _eval_query(q, rows):
    """q dict → list of projected tuples (post-DISTINCT when set)."""
    sols = _eval_bgp(q["base"], rows, q["graphs"])
    if q["bind"]:
        src, new, fn = q["bind"]
        impl = _BIND_IMPL[fn]
        sols = [{**mu, new: impl(mu[src])} for mu in sols]
    if q["union"]:
        arm_a, arm_b = q["union"]
        usols = _eval_bgp(arm_a, rows) + _eval_bgp(arm_b, rows)
        sols = [{**mu, **nu} for mu in sols for nu in usols
                if _compatible(mu, nu)]
    if q["optional"]:
        opats, oflts = q["optional"]
        osols = _eval_bgp(opats, rows)
        nxt = []
        for mu in sols:
            exts = [nu for nu in osols
                    if _compatible(mu, nu)
                    and all(_eval_filter(f, {**mu, **nu}) for f in oflts)]
            nxt.extend({**mu, **nu} for nu in exts) if exts else \
                nxt.append(mu)
        sols = nxt
    if q["minus"]:
        msols = _eval_bgp([q["minus"]], rows)
        sols = [mu for mu in sols
                if not any(mu.keys() & nu.keys() and _compatible(mu, nu)
                           for nu in msols)]
    for f in q["filters"]:
        sols = [mu for mu in sols if _eval_filter(f, mu)]
    tuples = [tuple(mu.get(v) for v in q["proj"]) for mu in sols]
    if q["distinct"]:
        return list(set(tuples))
    return tuples


# ------------------------------------------------------------ generator

def _term_str(term):
    kind, v = term
    if kind == "var":
        return f"?{v}"
    if kind == "iri":
        return f"<{v}>"
    return f'"{v}"'


def _pat_str(pat):
    return " ".join(_term_str(t) for t in pat)


def _gen_pattern(rng, vars_seen, numeric=False):
    s = (("var", rng.choice("abcd")) if rng.random() < 0.7
         else ("iri", rng.choice(SUBJECTS)))
    if numeric:
        p = ("iri", NUM_PRED)
        o = ("var", rng.choice("vwxy"))
    else:
        p = ("iri", rng.choice(PREDS))
        r = rng.random()
        o = (("var", rng.choice("vwxy")) if r < 0.6 else
             ("iri", rng.choice(IRIS)) if r < 0.8 else
             ("lit", rng.choice(LITS)))
    for t in (s, p, o):
        if t[0] == "var":
            vars_seen.add(t[1])
    return (s, p, o)


def _pat_vars(pats):
    return {v for pat in pats for k, v in pat if k == "var"}


def _gen_query(rng: random.Random):
    vars_seen: set = set()
    n_base = rng.randint(1, 3)
    want_numeric = rng.random() < 0.3
    base = [_gen_pattern(rng, vars_seen, numeric=(want_numeric and i == 0))
            for i in range(n_base)]
    if not _pat_vars(base):                      # keep ≥1 projectable var
        base[0] = ((("var", "a")), base[0][1], base[0][2])
        vars_seen.add("a")
    graphs = [rng.choice(GRAPHS) if rng.random() < 0.2 else None
              for _ in base]
    base_vars = sorted(_pat_vars(base))
    bind = None
    if rng.random() < 0.3:
        bind = (rng.choice(base_vars), "q",
                rng.choice(sorted(_BIND_IMPL)))
    union = optional = minus = None
    filters = []
    extra = rng.random()
    if extra < 0.25:
        # two arms binding the SAME variable set, sharing ≥1 var with base
        shared = ("var", rng.choice(base_vars))
        ov = ("var", rng.choice("vwxy"))
        arm_a = [(shared, ("iri", rng.choice(PREDS)), ov)]
        arm_b = [(shared, ("iri", rng.choice(PREDS)), ov)]
        union = (arm_a, arm_b)
    elif extra < 0.55:
        anchor = rng.choice(base_vars)
        opat = [(("var", anchor), ("iri", rng.choice(PREDS)),
                 ("var", "z"))]
        oflts = []
        if rng.random() < 0.5:
            # filter referencing a LEFT-side variable (LeftJoin path)
            lft = rng.choice(sorted(set(base_vars) - {"z"}) or [anchor])
            if rng.random() < 0.4:
                # introspection inside the DEFERRED LeftJoin condition —
                # the engine resolves sidecars through the joined
                # column namespace here
                oflts.append(rng.choice([
                    ("isiri", lft, True, False),
                    ("lang", lft, "en", False)]))
            else:
                oflts.append(("!=", lft, rng.choice(LITS + IRIS), False))
        if rng.random() < 0.4:
            oflts.append(("contains", "z", rng.choice("aeop"), False))
        optional = (opat, oflts)
    elif extra < 0.75:
        # MINUS anchored on an always-bound base variable
        mo = (("var", "m") if rng.random() < 0.6
              else ("lit", rng.choice(LITS)))
        minus = (("var", rng.choice(base_vars)),
                 ("iri", rng.choice(PREDS)), mo)
    bound = set(base_vars) | ({"q"} if bind else set()) | (
        _pat_vars(union[0]) if union else set())
    if bound and rng.random() < 0.7:
        var = rng.choice(sorted(bound))
        # introspection filters only target pattern-bound vars (?q is a
        # BIND product — the engine treats computed values as simple
        # literals while _meta_of would look its value up in the data)
        pat_bound = sorted(bound - {"q"})
        r2 = rng.random()
        if want_numeric and var in "vwxy" and rng.random() < 0.5:
            filters.append((rng.choice(("<", ">")), var,
                            str(rng.randint(2, 7)), True))
        elif r2 < 0.45 or not pat_bound:
            filters.append((rng.choice(("=", "!=", "contains")), var,
                            rng.choice(LITS + IRIS + ["a"]), False))
        elif r2 < 0.6:
            filters.append(("lang", rng.choice(pat_bound),
                            rng.choice(["en", "fr", "de", "es", "*"]),
                            False))
        elif r2 < 0.72:
            filters.append(("isiri", rng.choice(pat_bound),
                            rng.random() < 0.5, False))
        elif r2 < 0.82:
            filters.append(("dtype", rng.choice(pat_bound),
                            rng.choice([XSD_INT, XSD_STRING_DT, RDF_LS]),
                            False))
        elif r2 < 0.92:
            filters.append(("sameterm", rng.choice(pat_bound),
                            rng.choice(LITS + IRIS + sorted(TAGGED)
                                       + [str(rng.randint(0, 9))]),
                            False))
        else:
            filters.append(("isnumeric", rng.choice(pat_bound),
                            rng.random() < 0.5, False))
    projable = sorted(bound | ({"z"} if optional else set()))
    k = rng.randint(1, len(projable))
    proj = sorted(rng.sample(projable, k))
    limit = rng.randint(1, 8) if rng.random() < 0.4 else None
    return {"base": base, "graphs": graphs, "bind": bind, "union": union,
            "optional": optional, "minus": minus, "filters": filters,
            "proj": proj, "distinct": rng.random() < 0.4, "limit": limit}


def _to_text(q):
    lines = []
    for pat, g in zip(q["base"], q["graphs"]):
        if g is not None:
            lines.append(f"GRAPH <{g}> {{ {_pat_str(pat)} . }}")
        else:
            lines.append(_pat_str(pat) + " .")
    if q["bind"]:
        src, new, fn = q["bind"]
        lines.append(f"BIND({fn}(?{src}) AS ?{new})")
    if q["union"]:
        a, b = q["union"]
        lines.append("{ " + " . ".join(map(_pat_str, a)) + " } UNION { "
                     + " . ".join(map(_pat_str, b)) + " }")

    def flt(f):
        op, var, rhs, numeric = f
        if op == "contains":
            return f'FILTER(CONTAINS(?{var}, "{rhs}"))'
        if op == "lang":
            return f'FILTER(LANGMATCHES(LANG(?{var}), "{rhs}"))'
        if op == "isiri":
            return (f"FILTER(isIRI(?{var}))" if rhs
                    else f"FILTER(!isIRI(?{var}))")
        if op == "dtype":
            return f"FILTER(DATATYPE(?{var}) = <{rhs}>)"
        if op == "sameterm":
            if rhs.startswith("urn:"):
                r = f"<{rhs}>"
            elif rhs.isdigit():
                r = f'"{rhs}"^^<{XSD_INT}>'
            elif rhs in TAGGED:
                r = f'"{rhs}"@{TAGGED[rhs]}'
            else:
                r = f'"{rhs}"'
            return f"FILTER(sameTerm(?{var}, {r}))"
        if op == "isnumeric":
            return (f"FILTER(isNumeric(?{var}))" if rhs
                    else f"FILTER(!isNumeric(?{var}))")
        r = rhs if numeric else (f"<{rhs}>" if rhs.startswith("urn:")
                                 else f'"{rhs}"')
        return f"FILTER(?{var} {op} {r})"

    if q["optional"]:
        opats, oflts = q["optional"]
        body = " . ".join(map(_pat_str, opats))
        body += " " + " ".join(flt(f) for f in oflts)
        lines.append("OPTIONAL { " + body + " }")
    if q["minus"]:
        lines.append("MINUS { " + _pat_str(q["minus"]) + " . }")
    lines += [flt(f) for f in q["filters"]]
    head = "SELECT " + ("DISTINCT " if q["distinct"] else "") + \
        " ".join(f"?{v}" for v in q["proj"])
    tail = ""
    if q["limit"] is not None:
        tail = ("\nORDER BY " + " ".join(f"?{v}" for v in q["proj"])
                + f" LIMIT {q['limit']}")
    return head + " WHERE {\n  " + "\n  ".join(lines) + "\n}" + tail


def _sort_key(tup):
    # Spark ASC default: nulls first; strings ascending
    return tuple((0, "") if v is None else (1, v) for v in tup)


# ------------------------------------------------------------- the test

@pytest.mark.parametrize("seed", [7, 11, 23, 47, 101, 211, 499])
def test_sparql_differential_battery(spark, seed):
    rng = random.Random(seed)
    rows = _data(rng)
    eng = SparqlEngine(spark.createDataFrame(rows, SCHEMA))
    for i in range(15):
        q = _gen_query(rng)
        text = _to_text(q)
        expected = _eval_query(q, rows)
        res = [tuple(r[v] for v in q["proj"])
               for r in eng.query(text).collect()]
        if q["limit"] is not None:
            want = sorted(expected, key=_sort_key)[:q["limit"]]
            ok = res == want
        else:
            want, ok = Counter(expected), Counter(res) == Counter(expected)
        assert ok, (
            f"divergence (seed={seed}, query #{i}):\n{text}\n"
            f"want={want}\ngot={res}")


# --------------------------------------------- aggregate differential

def _gen_agg_query(rng: random.Random):
    vars_seen: set = set()
    numeric = rng.random() < 0.4
    base = [_gen_pattern(rng, vars_seen, numeric=numeric)]
    if rng.random() < 0.5:
        base.append(_gen_pattern(rng, vars_seen))
    # group on a subject-position var when possible, else any var —
    # all-ground pattern sets happen (subject 30% iri × object 40%
    # ground), so keep appending until at least one var exists
    gvars = sorted(_pat_vars(base))
    while not gvars:
        base.append(_gen_pattern(rng, vars_seen))
        gvars = sorted(_pat_vars(base))
    g = rng.choice(gvars)
    # aggregate over an object var distinct from the group var
    avars = sorted(_pat_vars(base) - {g})
    a = rng.choice(avars) if avars else None
    choices = ["count_star"]
    if a:
        # SUM over a var that binds non-numerics is fair game now: the
        # engine propagates the type error (group agg → unbound) and the
        # naive evaluator below mirrors that
        choices += ["count_distinct", "min", "max", "sample", "sum"]
    agg = rng.choice(choices)
    having = rng.randint(1, 3) if rng.random() < 0.3 else None
    limit = rng.randint(1, 5) if rng.random() < 0.5 else None
    agg_first = rng.random() < 0.5
    return {"base": base, "group": g, "aggvar": a, "agg": agg,
            "having": having, "limit": limit, "agg_first": agg_first}


def _agg_text(q):
    g, a = q["group"], q["aggvar"]
    expr = {"count_star": "COUNT(*)",
            "count_distinct": f"COUNT(DISTINCT ?{a})",
            "min": f"MIN(?{a})", "max": f"MAX(?{a})",
            "sample": f"SAMPLE(?{a})",
            "sum": f"SUM(?{a})"}[q["agg"]]
    cols = [f"({expr} AS ?agg)", f"?{g}"]
    if not q["agg_first"]:
        cols.reverse()
    text = ("SELECT " + " ".join(cols) + " WHERE {\n  "
            + "\n  ".join(_pat_str(p) + " ." for p in q["base"])
            + "\n} GROUP BY ?" + g)
    if q["having"] is not None:
        text += f" HAVING(COUNT(*) > {q['having']})"
    if q["limit"] is not None:
        # totally ordered: count desc (an aggregate in ORDER BY), group asc
        text += f" ORDER BY DESC(COUNT(*)) ?{g} LIMIT {q['limit']}"
    return text


def _agg_eval(q, rows):
    sols = _eval_bgp(q["base"], rows)
    groups: dict = {}
    for mu in sols:
        groups.setdefault(mu[q["group"]], []).append(mu)
    out = []
    for gval, mus in sorted(groups.items()):
        if q["having"] is not None and len(mus) <= q["having"]:
            continue
        a = q["aggvar"]
        vals = [mu[a] for mu in mus if a and a in mu]
        if q["agg"] == "count_star":
            agg = len(mus)
        elif q["agg"] == "count_distinct":
            agg = len(set(vals))
        elif q["agg"] == "sum":
            # SPARQL §18.5.1.5: a bound non-numeric input is a type
            # error and errors propagate — the group's SUM is unbound
            try:
                agg = sum(float(v) for v in vals)
            except ValueError:
                agg = None
        elif q["agg"] == "sample":
            # the engine's SAMPLE is deterministic: the lexical minimum
            agg = sorted(vals)[0]
        else:
            try:                       # all-numeric → numeric ordering
                keyed = sorted(vals, key=lambda v: (float(v), v))
            except ValueError:
                keyed = sorted(vals)   # else lexical
            agg = keyed[0] if q["agg"] == "min" else keyed[-1]
        out.append((gval, agg, len(mus)))
    return out


@pytest.mark.parametrize("seed", [5, 17, 1000, 1002])
def test_sparql_aggregate_differential(spark, seed):
    rng = random.Random(seed)
    rows = _data(rng)
    eng = SparqlEngine(spark.createDataFrame(rows, SCHEMA))
    for i in range(12):
        q = _gen_agg_query(rng)
        text = _agg_text(q)
        expected = _agg_eval(q, rows)
        df = eng.query(text)
        # projection order follows the query text
        want_cols = ["agg", q["group"]]
        if not q["agg_first"]:
            want_cols.reverse()
        assert df.columns == want_cols, text
        got = [(r[q["group"]], r["agg"]) for r in df.collect()]
        if q["limit"] is not None:
            want = [(g, a) for g, a, n in
                    sorted(expected, key=lambda t: (-t[2], t[0]))
                    ][:q["limit"]]
            ok = got == want
        else:
            want = {(g, a) for g, a, _ in expected}
            ok = set(got) == want and len(got) == len(want)
        assert ok, (f"divergence (seed={seed}, query #{i}):\n{text}\n"
                    f"want={want}\ngot={got}")


# ---------------- round-4 grammar closures: directed differentials -----
# Seeded random DATA × fixed query shapes for the four features closed in
# round 4 (BASE, UNDEF in VALUES, property paths under GRAPH ?var, UNION
# with subquery arms), each checked against an independent naive
# evaluation written straight from the algebra.

def _closure_pairs(rows, pred):
    """Per-graph transitive closure of `pred` edges computed naively
    (BFS per node) → {(g, s, o)}."""
    from collections import defaultdict
    adj = defaultdict(set)
    for s, p, o, dt, lang, g in rows:
        if p == pred:
            adj[(g, s)].add(o)
    out = set()
    for (g, s) in list(adj):
        seen, frontier = set(), {s}
        while frontier:
            nxt = set()
            for n in frontier:
                for m in adj.get((g, n), ()):
                    if m not in seen:
                        seen.add(m)
                        nxt.add(m)
            frontier = nxt
        out |= {(g, s, o) for o in seen}
    return out


@pytest.mark.parametrize("seed", [13, 29, 61])
def test_differential_round4_features(spark, seed):
    rng = random.Random(seed)
    rows = _data(rng)
    eng = SparqlEngine(spark.createDataFrame(rows, SCHEMA))

    # --- BASE: relative IRIs must equal the absolute-IRI twin ---------
    rel = eng.query("""BASE <urn:p0>
        SELECT ?s ?o WHERE { ?s <urn:p0> ?o }""").collect()
    # (urn: IRIs are absolute; exercise resolution against an http base)
    http_rows = [("http://ex.org/d/" + s[4:], "http://ex.org/d/" + p[4:],
                  o, dt, lg, g) for s, p, o, dt, lg, g in rows]
    eng_http = SparqlEngine(spark.createDataFrame(http_rows, SCHEMA))
    got = Counter((r.s, r.o) for r in eng_http.query(
        """BASE <http://ex.org/d/>
           SELECT ?s ?o WHERE { ?s <p1> ?o }""").collect())
    want = Counter((r.s, r.o) for r in eng_http.query(
        """SELECT ?s ?o WHERE { ?s <http://ex.org/d/p1> ?o }""").collect())
    assert got == want
    assert rel == eng.query(
        "SELECT ?s ?o WHERE { ?s <urn:p0> ?o }").collect()

    # --- UNDEF in VALUES: solution-compatibility join -----------------
    vals = [(rng.choice(SUBJECTS), rng.choice(LITS + IRIS)),
            (rng.choice(SUBJECTS), None),
            (None, rng.choice(LITS + IRIS))]
    rows_txt = " ".join(
        "({} {})".format(
            f"<{a}>" if a else "UNDEF",
            f"'{b}'" if b and not re.match(r"^[A-Za-z][\w+.-]*:", b)
            else (f"<{b}>" if b else "UNDEF"))
        for a, b in vals)
    got = Counter((r.s, r.o) for r in eng.query(f"""
        SELECT ?s ?o WHERE {{
          ?s <urn:p1> ?o .
          VALUES (?s ?o) {{ {rows_txt} }} }}""").collect())
    naive = Counter()
    for mu in _eval_bgp([(("var", "s"), ("iri", "urn:p1"),
                          ("var", "o"))], rows):
        for a, b in vals:
            if (a is None or mu["s"] == a) and (b is None or mu["o"] == b):
                naive[(mu["s"], mu["o"])] += 1
    assert got == naive

    # --- property path + under GRAPH ?var -----------------------------
    got = {(r.g, r.s, r.o) for r in eng.query(
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <urn:p2>+ ?o } }"
    ).collect()}
    assert got == _closure_pairs(rows, "urn:p2")

    # --- UNION with a subquery arm ------------------------------------
    got = Counter((r.s, r.o) for r in eng.query("""
        SELECT ?s ?o WHERE {
          { SELECT ?s ?o WHERE { ?s <urn:p1> ?o } }
          UNION
          { ?s <urn:p2> ?o } }""").collect())
    naive = Counter()
    for pred in ("urn:p1", "urn:p2"):
        for mu in _eval_bgp([(("var", "s"), ("iri", pred),
                              ("var", "o"))], rows):
            naive[(mu["s"], mu["o"])] += 1
    assert got == naive

# ---------------- round-5 closure: variable SERVICE endpoints ----------
# SERVICE ?ep { ... } ranges over the registered endpoints (one arm per
# endpoint with ?ep bound to its IRI).  Differential: seeded random data
# per endpoint × a fixed query shape, vs a naive evaluation straight
# from the algebra (cross product of outer solutions and per-endpoint
# inner solutions, merged on the shared variable).

@pytest.mark.parametrize("seed", [17, 43])
def test_differential_service_variable_endpoint(spark, seed):
    rng = random.Random(seed)
    rows = _data(rng)
    svc_rows = {f"urn:svc:{i}": _data(random.Random(seed * 7 + i))
                for i in range(3)}
    eng = SparqlEngine(
        spark.createDataFrame(rows, SCHEMA),
        services={iri: spark.createDataFrame(r, SCHEMA)
                  for iri, r in svc_rows.items()})
    got = Counter((r.ep, r.s, r.o, r.o2) for r in eng.query("""
        SELECT ?ep ?s ?o ?o2 WHERE {
          ?s <urn:p1> ?o .
          SERVICE ?ep { ?s <urn:p2> ?o2 } }""").collect())
    naive = Counter()
    outer = list(_eval_bgp([(("var", "s"), ("iri", "urn:p1"),
                             ("var", "o"))], rows))
    for iri, srows in svc_rows.items():
        for mu2 in _eval_bgp([(("var", "s"), ("iri", "urn:p2"),
                               ("var", "o2"))], srows):
            for mu in outer:
                if mu["s"] == mu2["s"]:
                    naive[(iri, mu["s"], mu["o"], mu2["o2"])] += 1
    assert got == naive
