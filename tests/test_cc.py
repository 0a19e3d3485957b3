"""Connected components: chains, stars, cycles, multiple components —
validated against a union-find reference on randomized graphs."""

import random

from kgraphmemory_spark.operators.cc import canonical_mapping, connected_components


def _cc_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = sorted([ra, rb])
            parent[hi] = lo
    # normalize: every node → min of component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    # path-compress to true min: find() with lexicographic-min union is
    # already min-rooted since we always attach hi under lo
    return comp


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    want = _cc_oracle(edges)
    # driver union-find path (small-graph cutover)
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == want, f"driver path: {got} != {want}"
    # distributed alternating-star path (force it)
    got_d = {r.node: r.component
             for r in connected_components(df, driver_threshold=0).collect()}
    assert got_d == want, f"distributed path: {got_d} != {want}"


def test_chain(spark):
    _run(spark, [("b", "c"), ("c", "d"), ("d", "e"), ("a", "b")])


def test_star(spark):
    _run(spark, [("m", f"x{i}") for i in range(10)])


def test_cycle(spark):
    _run(spark, [("a", "b"), ("b", "c"), ("c", "a")])


def test_two_components_and_self_loop(spark):
    _run(spark, [("a", "b"), ("c", "d"), ("e", "e")])


def test_random_graph(spark):
    rng = random.Random(5)
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_canonical_mapping_isolated_nodes(spark):
    ents = spark.createDataFrame(
        [("ent:a",), ("ent:b",), ("ent:z",)], "entity_id string")
    same = spark.createDataFrame(
        [("ent:a", "ent:b"), ("ent:a", "ent:missing")], "src string, dst string")
    got = {r.entity_id: r.canonical_id
           for r in canonical_mapping(ents, same).collect()}
    # pair with missing endpoint must NOT fire; isolated maps to self
    assert got == {"ent:a": "ent:a", "ent:b": "ent:a", "ent:z": "ent:z"}
