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


def test_minhash_md5_mode_matches_xxhash_on_dups(docs):
    """md5 string-hash mode (the DuckDB-mirrorable driver path) finds the
    same identical-doc collisions as the xxhash64 fast path."""
    ident = {(a, b) for a in range(5) for b in range(a + 1, 5)}
    for hash_fn in ("xxhash64", "md5"):
        cand = {(r.id_a, r.id_b) for r in
                D.minhash_lsh_candidates(docs, "doc_id", "text",
                                         hash_fn=hash_fn).collect()}
        assert ident <= cand
        assert not any(a >= 10 or b >= 10 for a, b in cand)


def test_simhash_md5_identical_docs_equal(docs):
    fps = {r.id: r.simhash for r in
           D.simhash_md5(docs, "doc_id", "text").collect()}
    assert len({fps[i] for i in range(5)}) == 1
    # scrambled-unique docs should not share the base fingerprint
    assert fps[15] != fps[0]


def test_dedup_components_giant_cluster(spark):
    """A 10k-copy duplicate cluster must dedup via per-bucket star edges
    (O(n) per bucket), never all-pairs (VERDICT.md round-1 item 4)."""
    dup = [(i, "common crawl boilerplate footer text repeated on every "
               "single page of the mirror site") for i in range(10_000)]
    uniq = [(10_000 + i, " ".join(f"tok{i}_{j}" for j in range(12)))
            for i in range(50)]
    df = spark.createDataFrame(dup + uniq, "doc_id long, text string")
    out = {r.id: r.keep_id for r in
           D.minhash_dedup_components(df, "doc_id", "text").collect()}
    assert len(out) == 10_050
    # every copy maps to the single keeper (string-min member id)
    assert {out[str(i)] for i in range(10_000)} == {"0"}
    # unique docs keep themselves
    for i in range(10_000, 10_050):
        assert out[str(i)] == str(i)


def test_dedup_components_agree_with_candidate_pairs(docs):
    """On the small corpus, CC over star edges yields the same classes as
    union-find over the all-pairs candidate output."""
    pairs = [(r.id_a, r.id_b) for r in
             D.minhash_lsh_candidates(docs, "doc_id", "text").collect()]
    parent = {i: i for i in range(20)}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    classes: dict[int, list[int]] = {}
    for i in range(20):
        classes.setdefault(find(i), []).append(i)
    # CC labels components with the lexicographic-min string id
    expected = {str(i): min(str(m) for m in classes[find(i)]) for i in range(20)}
    got = {r.id: r.keep_id for r in
           D.minhash_dedup_components(docs, "doc_id", "text").collect()}
    assert got == expected


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


def test_lsh_bands_must_divide_num_hashes(spark):
    """bands > num_hashes would hash zero rows per band (constant band
    hash → every doc in one bucket, silent mass dedup); non-divisors
    silently drop hashes — both raise."""
    from kgraphmemory_spark.operators.dedup import minhash_lsh_candidates
    df = spark.createDataFrame([(1, "a b c d e")], "id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_candidates(df, "id", "text", num_hashes=32, bands=64)
    with pytest.raises(ValueError, match="must divide"):
        minhash_lsh_candidates(df, "id", "text", num_hashes=32, bands=10)
