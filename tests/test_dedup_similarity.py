"""Dedup family + similarity search behavior tests."""

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.functions.vector import embed_text
from kgraphmemory_spark.operators import dedup as D
from kgraphmemory_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest tonight").split()
    rows = []
    for i in range(20):
        words = list(base)
        # docs 0-4 identical; 5-9 one-word variants (near-dups);
        # 10-19 scrambled-unique
        if 5 <= i < 10:
            words[3] = f"w{i}"
        elif i >= 10:
            words = [f"t{i}_{j}" for j in range(len(base))]
        rows.append((i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(docs):
    out = {r.text_md5: (r.keep_id, r.n_copies)
           for r in D.exact_duplicates(docs, "doc_id", "text").collect()}
    assert max(n for _, n in out.values()) == 5
    assert sorted(k for k, n in out.values() if n == 5) == [0]


def test_minhash_candidates_cover_near_dups(docs):
    cand = {(r.id_a, r.id_b) for r in
            D.minhash_lsh_candidates(docs, "doc_id", "text").collect()}
    # identical docs must collide in every band
    for a in range(5):
        for b in range(a + 1, 5):
            assert (a, b) in cand
    # unique scrambled docs must not pair with the base cluster
    assert not any(a >= 10 or b >= 10 for a, b in cand)


def test_jaccard_verify_filters_candidates(spark, docs):
    cand = D.minhash_lsh_candidates(docs, "doc_id", "text")
    ver = D.jaccard_verify(cand, docs, "doc_id", "text", threshold=0.99)
    pairs = {(r.id_a, r.id_b) for r in ver.collect()}
    assert pairs == {(a, b) for a in range(5) for b in range(a + 1, 5)}


def test_simhash_identical_docs_equal(docs):
    fps = {r.id: r.simhash for r in
           D.simhash_buckets(docs, "doc_id", "text").collect()}
    assert len({fps[i] for i in range(5)}) == 1
    # near-dups within small hamming distance of the base fingerprint
    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    for i in range(5, 10):
        assert ham(fps[0], fps[i]) <= 16


@pytest.fixture(scope="module")
def vectors(spark):
    texts = ["hash join fast", "hash join slow", "sort merge join",
             "table scan", "vector search", "group by agg",
             "window function", "stream batch"]
    rows = [(i, embed_text(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_brute_force_topk_self_similarity(vectors):
    q = embed_text("hash join fast")
    top = S.brute_force_topk(vectors, q, k=3).collect()
    assert top[0].vec_id == 0 and top[0].score > 0.999
    assert top[1].vec_id == 1  # shares 2/3 tokens


def test_lsh_topk_finds_self(vectors):
    q = embed_text("hash join fast")
    indexed, planes = S.lsh_index(vectors, dim=16, bits=4)
    got = S.lsh_topk(indexed, planes, q, k=3).collect()
    assert got and got[0].vec_id == 0


def test_ivf_topk_recall_vs_brute_force(vectors):
    q = embed_text("sort merge join")
    bf = [r.vec_id for r in S.brute_force_topk(vectors, q, k=3).collect()]
    indexed, cents = S.ivf_index(vectors, dim=16, n_centroids=4)
    ivf = [r.vec_id for r in S.ivf_topk(indexed, cents, q, k=3, nprobe=4).collect()]
    assert ivf == bf  # nprobe = all clusters → exact
