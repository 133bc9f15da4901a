"""Distributed k-means (operators/clustering.py): equivalence with a
local numpy Lloyd's reference implementing the SAME deterministic
contract (smallest-id init, argmin ties to the smaller cid, rounded
means, empty clusters keep their centroid), plus edge cases."""

import numpy as np
import pytest

from spark_tsne_spark.operators.clustering import kmeans_assign


def _local_kmeans(ids, X, k, iters, decimals=9):
    """Reference Lloyd's with the operator's exact contract."""
    order = np.argsort(ids)
    ids, X = np.asarray(ids)[order], np.asarray(X, dtype=np.float64)[order]
    C = X[:k].copy()

    def assign(C):
        # left-to-right fold like F.aggregate / list_sum; ties -> min cid
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # argmin takes first (= smallest cid) on ties

    for _ in range(iters):
        a = assign(C)
        for c in range(len(C)):
            m = a == c
            if m.any():
                C[c] = np.round(X[m].mean(axis=0), decimals)
    return dict(zip(ids.tolist(), assign(C).tolist()))


def _make_df(spark, ids, X):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, X)],
        "vec_id long, embedding array<double>",
    )


def test_kmeans_matches_local_reference(spark):
    rng = np.random.default_rng(7)
    X = np.round(rng.normal(size=(200, 8)), 4)
    ids = rng.permutation(200)
    got = {
        r["id"]: r["cluster"]
        for r in kmeans_assign(_make_df(spark, ids, X), k=5, num_iters=4).collect()
    }
    want = _local_kmeans(ids, X, k=5, iters=4)
    assert got == want
    assert len(set(got.values())) == 5


def test_kmeans_deterministic_across_partitionings(spark):
    rng = np.random.default_rng(3)
    X = np.round(rng.normal(size=(120, 6)), 4)
    ids = np.arange(120)
    df = _make_df(spark, ids, X)
    a = {r["id"]: r["cluster"] for r in kmeans_assign(df, 4, 3).collect()}
    b = {
        r["id"]: r["cluster"]
        for r in kmeans_assign(df.repartition(13), 4, 3).collect()
    }
    assert a == b


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # Two tight groups but k=3: the three smallest ids are all in
    # group A, so after one update two centroids converge onto A's
    # mean and at least one cluster empties — the operator must keep
    # its previous centroid and still partition all rows.
    pts = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [10.0, 10.0], [10.1, 10.0]]
    df = _make_df(spark, range(5), pts)
    out = kmeans_assign(df, k=3, num_iters=3).collect()
    assert len(out) == 5
    got = {r["id"]: r["cluster"] for r in out}
    assert got == _local_kmeans(list(range(5)), pts, k=3, iters=3)


def test_kmeans_zero_iters_is_pure_init_assignment(spark):
    pts = [[0.0], [1.0], [10.0], [11.0]]
    got = {
        r["id"]: r["cluster"]
        for r in kmeans_assign(_make_df(spark, range(4), pts), 2, 0).collect()
    }
    # centroids are rows 0 and 1 verbatim: row2/3 nearer centroid 1
    assert got == {0: 0, 1: 1, 2: 1, 3: 1}


def test_kmeans_validates_params(spark):
    df = _make_df(spark, [0], [[1.0]])
    with pytest.raises(ValueError):
        kmeans_assign(df, k=0)
    with pytest.raises(ValueError):
        kmeans_assign(df, k=2, num_iters=-1)


def test_kmeans_hash_init_differs_and_is_deterministic(spark):
    rng = np.random.default_rng(5)
    X = np.round(rng.normal(size=(100, 4)), 4)
    df = _make_df(spark, range(100), X)
    a = {r["id"]: r["cluster"] for r in kmeans_assign(df, 4, 2, init="hash").collect()}
    b = {r["id"]: r["cluster"] for r in kmeans_assign(df, 4, 2, init="hash").collect()}
    assert a == b  # same seed -> same result
    c = {
        r["id"]: r["cluster"]
        for r in kmeans_assign(df, 4, 2, init="hash", seed=7).collect()
    }
    assert isinstance(list(c.values())[0], int)
    with pytest.raises(ValueError):
        kmeans_assign(df, 4, 2, init="wat")


def test_kmeans_include_dist_consistent(spark):
    """dist is the squared L2 to the ASSIGNED centroid: 0 for a row
    that coincides with its centroid; recomputable from the
    assignment."""
    pts = [[0.0, 0.0], [0.0, 0.0], [4.0, 0.0], [4.0, 0.0], [4.0, 2.0]]
    df = _make_df(spark, range(5), pts)
    out = kmeans_assign(df, k=2, num_iters=2, include_dist=True).collect()
    by = {r["id"]: r for r in out}
    assert by[0]["dist"] == 0.0
    # centroid of cluster holding rows 2-4 is (4, 2/3)
    assert abs(by[4]["dist"] - (0.0 + (2 - 2 / 3) ** 2)) < 1e-6
