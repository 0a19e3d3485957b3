"""shortest_hops / pagerank (operators/graph.py) vs independent
single-node references: hand-checked BFS on shaped graphs (cycle, chain,
unreachable island, max_hops cutoff) and a numpy power iteration running
the identical GraphX-static recurrence on random digraphs."""

import random

import pytest

from kgraphmemory_spark.operators.graph import pagerank, shortest_hops


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_bfs_chain_cycle_island(spark):
    # a->b->c->a cycle, c->d tail; island x->y unreachable from a
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
                       ("x", "y")])
    got = {r.node: r.hops for r in shortest_hops(e, ["a"]).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_multi_source_and_direction(spark):
    e = _edges(spark, [("a", "b"), ("c", "b"), ("b", "d")])
    got = {r.node: r.hops for r in shortest_hops(e, ["a", "c"]).collect()}
    assert got == {"a": 0, "c": 0, "b": 1, "d": 2}
    # directed: nothing reaches backwards from d
    got_d = {r.node: r.hops for r in shortest_hops(e, ["d"]).collect()}
    assert got_d == {"d": 0}


def test_bfs_max_hops_cutoff(spark):
    chain = [(f"n{i}", f"n{i + 1}") for i in range(10)]
    got = {r.node: r.hops
           for r in shortest_hops(_edges(spark, chain), ["n0"],
                                  max_hops=4).collect()}
    assert got == {f"n{i}": i for i in range(5)}


def _numpy_pagerank(pairs, iterations=10, damping=0.85):
    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    uniq = sorted(set(pairs))
    outdeg = {}
    for s, _ in uniq:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        contrib = {n: 0.0 for n in nodes}
        for s, d in uniq:
            contrib[d] += r[s] / outdeg[s]
        r = {n: (1 - damping) + damping * contrib[n] for n in nodes}
    return r, idx


@pytest.mark.parametrize("seed", [3, 17])
def test_pagerank_matches_power_iteration(spark, seed):
    rng = random.Random(seed)
    nodes = [f"v{i}" for i in range(20)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(60)]
    pairs = [(s, d) for s, d in pairs if s != d]
    exp, _ = _numpy_pagerank(pairs)
    got = {r.node: r.pr
           for r in pagerank(_edges(spark, pairs), iterations=10).collect()}
    assert set(got) == set(exp)
    for n in exp:
        assert got[n] == pytest.approx(exp[n], abs=1e-9), n


def test_pagerank_star_with_dangling_sink(spark):
    # hub -> s1..s3; sinks are dangling (mass NOT redistributed, GraphX
    # staticPageRank semantics): after convergence-ish 10 iters,
    # hub = 0.15 (nothing points at it), sinks = 0.15 + 0.85 * hub / 3
    e = _edges(spark, [("hub", "s1"), ("hub", "s2"), ("hub", "s3")])
    got = {r.node: r.pr for r in pagerank(e, iterations=10).collect()}
    assert got["hub"] == pytest.approx(0.15)
    for s in ("s1", "s2", "s3"):
        assert got[s] == pytest.approx(0.15 + 0.85 * 0.15 / 3)
