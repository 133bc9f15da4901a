"""PageRank over candidate-pair graphs (operators/graph.py)."""

import numpy as np
import pytest

from spark_tsne_spark.operators.graph import (
    canonical_by_pagerank,
    pagerank,
    symmetrize_edges,
)


def _numpy_pagerank(edges, num_iters=10, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(num_iters):
        dm = r[deg == 0].sum()
        nxt = np.full(n, (1.0 - d) / n) + d * dm / n
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / deg[idx[s]]
        nxt += d * contrib
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_power_method(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, num_iters=10).collect()}
    want = _numpy_pagerank(edges)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-12, n
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_mass_redistributed(spark):
    # node 3 has no out-edges: its mass must recycle, ranks sum to 1
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, num_iters=20).collect()}
    want = _numpy_pagerank(edges, num_iters=20)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for n in want:
        assert abs(got[n] - want[n]) < 1e-12
    # the sink accumulates the most rank
    assert got[3] == max(got.values())


def test_symmetrize_and_canonical(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (1, 2)], "i long, j long")
    e = {(r["src"], r["dst"]) for r in symmetrize_edges(pairs).collect()}
    assert e == {(1, 2), (2, 1), (2, 3), (3, 2)}
    pr = {r["node"]: r["rank"] for r in canonical_by_pagerank(pairs).collect()}
    # 2 is the hub of the path graph 1-2-3
    assert pr[2] == max(pr.values())
    assert abs(sum(pr.values()) - 1.0) < 1e-9


def test_pagerank_validation(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, num_iters=0)
    empty = df.where("src < 0")
    assert pagerank(empty).count() == 0
