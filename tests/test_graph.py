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


def test_pagerank_distributed_matches_driver_path(spark):
    # Same edges through BOTH physical strategies: the default gate
    # (driver bincount loop) and driver_edge_cap=0 (forced
    # distributed join loop, edges pre-partitioned on src). One
    # semantics, two plans — equality to float64 round-off.
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1), (6, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    drv = {r["node"]: r["rank"] for r in pagerank(df, num_iters=8).collect()}
    dist = {
        r["node"]: r["rank"]
        for r in pagerank(df, num_iters=8, driver_edge_cap=0).collect()
    }
    assert set(drv) == set(dist)
    for n in drv:
        assert abs(drv[n] - dist[n]) < 1e-12, n
    want = _numpy_pagerank(edges, num_iters=8)
    for n in want:
        assert abs(dist[n] - want[n]) < 1e-12, n


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


def test_label_propagation_two_cliques_with_bridge(spark):
    # Two 4-cliques joined by one bridge edge: LPA must settle on one
    # label per clique WITHOUT merging them (connected components
    # would). Labels converge to each clique's minimum node id.
    from spark_tsne_spark.operators.graph import (
        label_propagation,
        symmetrize_edges,
    )

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    pairs = spark.createDataFrame(c1 + c2 + [(3, 10)], "i long, j long")
    e = symmetrize_edges(pairs)
    got = {
        r["node"]: r["label"]
        for r in label_propagation(e, num_iters=4).collect()
    }
    assert {got[n] for n in range(4)} == {0}
    assert {got[n] for n in range(10, 14)} == {10}


def test_label_propagation_distributed_matches_driver(spark):
    from spark_tsne_spark.operators.graph import (
        label_propagation,
        symmetrize_edges,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (5, 6), (6, 7), (3, 5)],
        "i long, j long",
    )
    e = symmetrize_edges(pairs)
    drv = {
        r["node"]: r["label"]
        for r in label_propagation(e, num_iters=3).collect()
    }
    dist = {
        r["node"]: r["label"]
        for r in label_propagation(e, num_iters=3, driver_edge_cap=0).collect()
    }
    assert drv == dist


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


def test_triangle_counts_vs_naive(spark):
    """Degree-oriented enumeration must equal the naive per-node
    count on a graph with a hot hub + cliques + a triangle-free
    star."""
    import itertools

    edges = set()
    # K4 on 0-3 (each node in 3 triangles)
    edges |= {(a, b) for a, b in itertools.combinations([0, 1, 2, 3], 2)}
    # separate triangle 10-11-12
    edges |= {(10, 11), (11, 12), (10, 12)}
    # star center 20 with leaves 21..26: no triangles
    edges |= {(20, x) for x in range(21, 27)}
    # bridge connecting star leaf to clique (still no new triangle)
    edges.add((21, 0))
    from spark_tsne_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(sorted(edges), "i long, j long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    # naive reference
    nodes = {n for e in edges for n in e}
    und = edges | {(b, a) for a, b in edges}
    want = {}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (a, b) in und and (b, c) in und and (a, c) in und:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    assert got == want
    assert got[0] == 3 and got[10] == 1 and 20 not in got


def test_triangle_counts_input_normalization(spark):
    """Self-loops, duplicate and reversed edges collapse before
    counting."""
    from spark_tsne_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)],
        "i long, j long",
    )
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}
