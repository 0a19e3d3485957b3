"""Unit tests for the pure-Python rule-set (no Spark needed)."""

import uuid

from kgraphmemory_spark import semantics as S


def test_extract_text_strips_tags_scripts_comments():
    html = (b"<html><head><title>T</title><style>p {x}</style>"
            b"<script>var a = '<p>hi</p>';</script></head>"
            b"<!-- c --><body><p>hello   world</p></body></html>")
    assert S.extract_text(html) == "T hello world"


def test_extract_text_entities_and_none():
    assert S.extract_text(b"<p>a &amp; b &lt;c&gt; &quot;d&quot;</p>") == 'a & b <c> "d"'
    assert S.extract_text(None) == ""
    assert S.extract_text(b"") == ""


def test_extract_text_invalid_utf8_is_deterministic():
    assert S.extract_text(b"<p>ok \xff\xfe</p>") == S.extract_text(b"<p>ok \xff\xfe</p>")


def test_tokenize():
    assert S.tokenize("") == []
    assert S.tokenize("a b c") == ["a", "b", "c"]


def test_mentions_bigram():
    toks = ["fast", "hash", "join", "slow"]
    ms = S.extract_mentions(toks)
    uni = [(p, s) for p, s, k in ms if k == "unigram"]
    big = [(p, s) for p, s, k in ms if k == "bigram"]
    assert uni == [(0, "fast"), (1, "hash"), (2, "join"), (3, "slow")]
    assert big == [(1, "hash join")]


def test_raw_triples_adjacency():
    assert S.extract_raw_triples(["a", "b", "c"]) == [
        (0, "a", S.REL_NEXT, "b"), (1, "b", S.REL_NEXT, "c")]
    assert S.extract_raw_triples(["x"]) == []


def test_canonical_map_transitive_chain():
    # sort—order—sequence chain: all collapse to the lexicographic min
    ids = {"ent:sort", "ent:order", "ent:sequence", "ent:zzz"}
    m = S.canonical_map(ids)
    assert m["ent:sort"] == m["ent:order"] == m["ent:sequence"] == "ent:order"
    assert m["ent:zzz"] == "ent:zzz"


def test_canonical_map_pairs_need_both_endpoints():
    m = S.canonical_map({"ent:agg"})  # 'group' absent → no merge
    assert m["ent:agg"] == "ent:agg"


def test_vector_record_id_uuid5_parity():
    # exact reference behavior: uuid5(NAMESPACE_URL, f"{uri}#{vector_id}")
    # (reference kgraph.py:82-88)
    got = S.vector_record_id("urn:e1", "entity_value")
    assert got == str(uuid.uuid5(uuid.NAMESPACE_URL, "urn:e1#entity_value"))


def test_build_kg_golden_tiny():
    pages = [
        {"url": "u1", "html": b"<p>sort order sort</p>", "lang": "en"},
        {"url": "u2", "html": b"<p>order merge</p>", "lang": "en"},
    ]
    kg = S.build_kg(pages)
    ids = {e["entity_id"] for e in kg.entities}
    # sort+order merge into ent:order
    assert ids == {"ent:order", "ent:merge"}
    rel = kg.triple_set()
    assert ("ent:order", S.REL_NEXT, "ent:order") in rel
    assert ("ent:order", S.REL_NEXT, "ent:merge") in rel
    ent_order = next(e for e in kg.entities if e["entity_id"] == "ent:order")
    assert ent_order["name"] == "order"
    assert ent_order["mention_count"] == 4
