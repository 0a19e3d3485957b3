"""Corpus-curation operators (operators/corpus.py): per-domain caps,
deterministic stratified sampling, token-budget shard packing.

Oracles here are hand-computed / pandas recomputations; the DuckDB twins
run under tests/driver_mirror.py via the t6/t7/t8 registry entries.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.operators.corpus import (
    cap_per_domain,
    pack_shards,
    rate_threshold_hex,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    # skewed domains: hub has 40 docs, mid has 7, tail domains 2 each
    rows = []
    i = 0
    for dom, n in [("hub", 40), ("mid", 7), ("t1", 2), ("t2", 2)]:
        for _ in range(n):
            rows.append((i, dom, "en" if i % 3 else "de",
                         " ".join(f"w{j}" for j in range(5 + i % 9))))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, "
                                       "lang string, text string")


def test_cap_keeps_lowest_ids_per_domain(docs):
    out = cap_per_domain(docs, "source", "doc_id", cap=5, salt_buckets=3)
    got = {(r.source, r.doc_id) for r in out.collect()}
    pdf = docs.toPandas()
    want = set()
    for dom, g in pdf.groupby("source"):
        for did in sorted(g.doc_id)[:5]:
            want.add((dom, did))
    assert got == want
    # under-cap domains pass through complete
    assert sum(1 for d, _ in got if d in ("t1", "t2")) == 4
    # hub capped exactly
    assert sum(1 for d, _ in got if d == "hub") == 5


def test_cap_no_drop_when_all_under(docs):
    out = cap_per_domain(docs, "source", "doc_id", cap=100)
    assert out.count() == docs.count()


def test_cap_preserves_columns(docs):
    out = cap_per_domain(docs, "source", "doc_id", cap=2)
    assert set(out.columns) == set(docs.columns)


def test_rate_threshold_edges():
    assert rate_threshold_hex(1.0) == "g"
    assert rate_threshold_hex(0.0) == ""
    assert rate_threshold_hex(0.25) == "40000000"
    assert rate_threshold_hex(0.5) == "80000000"
    # every 8-hex md5 prefix sorts below 'g' and none below ''
    assert "ffffffff" < "g" and not ("00000000" < "")


def test_stratified_sample_matches_python_oracle(docs):
    rates = {"en": 0.5, "de": 0.25}
    out = stratified_sample(docs, "lang", "doc_id", rates)
    got = {r.doc_id for r in out.collect()}
    want = set()
    for r in docs.collect():
        thr = rate_threshold_hex(rates[r.lang])
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8]
        if h < thr:
            want.add(r.doc_id)
    assert got == want
    assert 0 < len(got) < docs.count()


def test_stratified_sample_deterministic_and_nested(docs):
    """Resume-safety: rerun keeps the same rows; a lower rate keeps a
    strict subset of a higher rate (hash thresholding is monotone)."""
    a = {r.doc_id for r in
         stratified_sample(docs, "lang", "doc_id", {"en": 0.5},
                           default_rate=0.5).collect()}
    b = {r.doc_id for r in
         stratified_sample(docs, "lang", "doc_id", {"en": 0.5},
                           default_rate=0.5).collect()}
    assert a == b
    quarter = {r.doc_id for r in
               stratified_sample(docs, "lang", "doc_id", {"en": 0.25},
                                 default_rate=0.25).collect()}
    assert quarter <= a


def test_stratified_default_rate_one_keeps_all(docs):
    out = stratified_sample(docs, "lang", "doc_id", {}, default_rate=1.0)
    assert out.count() == docs.count()


def test_pack_shards_matches_python_oracle(docs):
    out = pack_shards(docs, "source", "doc_id", "text", budget_tokens=20)
    got = {(r.doc_id, r.n_tokens, r.shard_ix, r.shard_id)
           for r in out.collect()}
    pdf = docs.toPandas().sort_values("doc_id")
    want = set()
    for dom, g in pdf.groupby("source"):
        cum = 0
        for _, row in g.iterrows():
            n = len(row.text.split())
            ix = cum // 20
            want.add((row.doc_id, n, ix, f"{dom}#{ix}"))
            cum += n
    assert got == want


def test_pack_shards_budget_overflow_bound(docs):
    """Each shard's token total is < budget + its last doc's tokens
    (greedy fill can overflow by at most the boundary document)."""
    budget = 20
    out = pack_shards(docs, "source", "doc_id", "text",
                      budget_tokens=budget).toPandas()
    for _, g in out.groupby("shard_id"):
        assert g.n_tokens.sum() < budget + g.n_tokens.iloc[-1] + 1

def test_cap_stats_hook(spark, docs):
    stats = {}
    kept = cap_per_domain(docs, "source", "doc_id", cap=5,
                          salt_buckets=4, stats=stats)
    # hub (40) and mid (7) are over cap 5; tails (2 each) pass through
    assert kept.count() == 5 + 5 + 2 + 2
    assert stats == {"over_cap_domains": 2,
                     "final_sort_bound_rows": 5 * 4}


def test_synthetic_zipf_corpus_closed_forms(spark):
    from kgraphmemory_spark.datagen import synthetic_zipf_corpus
    corpus = synthetic_zipf_corpus(spark, rows=1000,
                                   hub_rows=(400, 100),
                                   tail_domains=50, writers=8,
                                   partitions=4)
    per_dom = {r.domain: r.n for r in corpus.groupBy("domain")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_dom["hub000"] == 400 and per_dom["hub001"] == 100
    tail = {d: n for d, n in per_dom.items() if d.startswith("d")}
    assert len(tail) == 50 and set(tail.values()) == {10}
    # token count per doc = (id % 97) + 1, exact total
    from kgraphmemory_spark.functions.text import token_count
    got = corpus.agg(F.sum(token_count(F.col("text")))).collect()[0][0]
    cycles, rem = divmod(1000, 97)
    assert got == cycles * (97 * 98 // 2) + rem * (rem + 1) // 2
    # the cap operator keeps hub caps + all tail rows (closed form)
    kept = cap_per_domain(corpus, "domain", "doc_id", cap=20,
                          salt_buckets=4).count()
    assert kept == 20 * 2 + 500
