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


def test_semantic_contamination_small(spark):
    from spark_tsne_spark.operators.dedup import semantic_contamination

    train = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, [0.0, 1.0]), (102, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    evalset = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    got = {
        (r["train_id"], r["eval_id"]): r["cosine"]
        for r in semantic_contamination(
            train, evalset, min_cosine=0.5
        ).collect()
    }
    # exact match hits cos=1; orthogonal misses; 45-degree hits ~0.707
    assert got[(100, 1)] == 1.0
    assert (101, 1) not in got
    assert abs(got[(102, 1)] - 0.707107) < 1e-6
