"""Round-11 pins: the fused list-form symmetrize must equal the
public explode-form compute_p bit-for-bit, and the distributed
affinity path must release the banded-LSH projection cache."""

import numpy as np
from pyspark.sql import functions as F

from spark_tsne_spark.operators.affinities import (
    adjacency_from_calibrated,
    compute_p,
)
from spark_tsne_spark.operators.x2p import calibrated_neighbors


def _points(spark, n=300, d=8, seed=13):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)) * 3.0
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, features array<double>")


def _adj_map(df):
    return {
        r["i"]: (list(r["js"]), list(r["ps"]))
        for r in df.collect()
    }


def test_adjacency_from_calibrated_equals_compute_p(spark):
    """Same neighbor ids in the same order and BIT-IDENTICAL p values
    as compute_p(explode(cal)) — the fused path only reshapes the
    shuffle, never the arithmetic (sum of the two orientations is a
    2-term IEEE add either way)."""
    df = _points(spark).cache()
    df.count()
    n = df.count()
    cal = calibrated_neighbors(df, perplexity=12.0).cache()
    cal.count()
    p_ji = cal.select(
        "i", F.explode(F.arrays_zip("js", "ps")).alias("e")
    ).select("i", F.col("e.js").alias("j"), F.col("e.ps").alias("p"))
    ref = _adj_map(compute_p(p_ji, n, 8))
    got = _adj_map(adjacency_from_calibrated(cal.select("i", "js", "ps"), n, 8))
    assert set(ref) == set(got)
    for i in ref:
        js_r, ps_r = ref[i]
        js_g, ps_g = got[i]
        assert js_r == js_g, f"row {i} neighbor order differs"
        assert ps_r == ps_g, f"row {i} p values differ (must be bit-identical)"
    cal.unpersist()
    df.unpersist()


def test_adjacency_fused_single_orientation_rows(spark):
    """Rows reachable in only ONE direction still get the clamped
    half-sum: a hand-built asymmetric calibrated input (0 lists 1;
    1 lists 2; 2 lists 1) exercises fwd-only, rev-only and both."""
    rows = [
        (0, [1], [0.4]),
        (1, [2], [0.6]),
        (2, [1], [0.2]),
    ]
    cal = spark.createDataFrame(
        rows, "i long, js array<long>, ps array<double>"
    )
    n = 3
    got = _adj_map(adjacency_from_calibrated(cal, n, 2))
    # pair (0,1): only 0→1 → 0.4/2n; pair (1,2): both → (0.6+0.2)/2n
    assert got[0] == ([1], [0.4 / 6.0])
    assert got[1] == ([0, 2], [0.4 / 6.0, (0.6 + 0.2) / 6.0])
    assert got[2] == ([1], [(0.6 + 0.2) / 6.0])


def _brute_non_edge(Y):
    """Exact negF/sumQ: every pair's Student-t term, self excluded."""
    n, d = Y.shape
    diff = Y[:, None, :] - Y[None, :, :]
    d2 = (diff * diff).sum(axis=2)
    q = 1.0 / (1.0 + d2)
    np.fill_diagonal(q, 0.0)
    q[d2 == 0] = 0.0  # duplicates excluded, reference leaf rule
    sumQ = q.sum(axis=1)
    negF = ((q * q)[:, :, None] * diff).sum(axis=1)
    return negF, sumQ


def test_coarse_tree_theta0_is_exact():
    """leaf_size>1 with θ=0 must reproduce the brute-force non-edge
    forces exactly: nothing passes the accept test, so every coarse
    leaf expands to per-point Student-t terms."""
    from spark_tsne_spark.sptree import FlatTree, non_edge_forces

    rng = np.random.default_rng(17)
    Y = rng.normal(size=(400, 2)) * 5.0
    Y[50:60] = Y[10]  # planted duplicates: excluded like the fine leaf
    ref_f, ref_q = _brute_non_edge(Y)
    tree = FlatTree.build(Y, leaf_size=16)
    got_f, got_q = non_edge_forces(tree, Y, theta=0.0)
    np.testing.assert_allclose(got_q, ref_q, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got_f, ref_f, rtol=1e-9, atol=1e-12)


def test_coarse_tree_no_less_accurate_than_fine():
    """At working θ the coarse tree's error vs exact must not exceed
    the fine tree's (rejected coarse leaves are computed exactly where
    the fine tree still θ-approximates sub-cells)."""
    from spark_tsne_spark.sptree import FlatTree, non_edge_forces

    rng = np.random.default_rng(23)
    Y = rng.normal(size=(600, 2)) * 3.0
    ref_f, ref_q = _brute_non_edge(Y)
    fine_f, fine_q = non_edge_forces(FlatTree.build(Y), Y, theta=0.5)
    co_f, co_q = non_edge_forces(
        FlatTree.build(Y, leaf_size=32), Y, theta=0.5
    )
    err_fine = np.abs(fine_q - ref_q).sum() + np.abs(fine_f - ref_f).sum()
    err_co = np.abs(co_q - ref_q).sum() + np.abs(co_f - ref_f).sum()
    # Small multiplicative slack (ADVICE r11): the guarantee is
    # per-contribution (a rejected coarse leaf is EXACT where the fine
    # tree θ-approximates), but the totals compare SUMS of signed
    # errors — the fine tree's extra leaf-level error can partially
    # CANCEL the shared θ-accepted cells' error, making its total
    # smaller on unlucky seeds even though it is pointwise worse.
    assert err_co <= err_fine * 1.05 + 1e-9, (err_co, err_fine)


def test_coarse_build_leaf1_bitcompat():
    """leaf_size=1 must produce the identical structure the default
    build does (the reference-exact path the goldens pin)."""
    from spark_tsne_spark.sptree import FlatTree

    rng = np.random.default_rng(5)
    Y = rng.normal(size=(500, 2))
    a = FlatTree.build(Y)
    b = FlatTree.build(Y, leaf_size=1)
    assert (a.center == b.center).all()
    assert (a.count == b.count).all()
    assert (a.children == b.children).all()
    assert (a.leaf == b.leaf).all()
    assert (b.leaf_start == -1).all() and len(b.leaf_pts) == 0


def test_coarse_tree_broadcast_roundtrip():
    """The coarse tree pickles/unpickles intact (it rides a Spark
    broadcast every iteration)."""
    import pickle

    from spark_tsne_spark.sptree import FlatTree, non_edge_forces

    rng = np.random.default_rng(31)
    Y = rng.normal(size=(300, 2))
    tree = FlatTree.build(Y, leaf_size=8)
    tree2 = pickle.loads(pickle.dumps(tree))
    f1, q1 = non_edge_forces(tree, Y, theta=0.4)
    f2, q2 = non_edge_forces(tree2, Y, theta=0.4)
    assert (f1 == f2).all() and (q1 == q2).all()


def test_drop_cached_workspaces():
    """The release hook empties the process cache (optionally by
    prefix) and a subsequent request re-creates a usable mapping."""
    from spark_tsne_spark import runtime

    a = runtime.cached_shared_empty("r11_test_ws", (64, 64))
    a[:] = 7.0
    b = runtime.cached_shared_empty("r11_other_ws", (8, 8))
    b[:] = 1.0
    n = runtime.drop_cached_workspaces(prefix="r11_test_")
    assert n == 1
    assert ("r11_other_ws", (8, 8), "<f8") in runtime._WS_CACHE
    # dropped name re-creates a fresh, writable mapping
    c = runtime.cached_shared_empty("r11_test_ws", (64, 64))
    c[:] = 3.0
    assert float(c[0, 0]) == 3.0
    assert runtime.drop_cached_workspaces() >= 1
    assert not runtime._WS_CACHE


def test_unpin_blas_floor():
    """The floor lifts fair-share for query-side kernels whose
    plan-side partition count overstates real concurrency, and is
    itself capped at nproc."""
    import os

    from spark_tsne_spark import runtime

    if runtime._resolve_blas_setter() is False:
        import pytest

        pytest.skip("no OpenBLAS in this numpy build")
    cpus = os.cpu_count() or 1
    runtime.unpin_blas_threads(cpus, floor=4)
    assert runtime._blas_current == min(cpus, 4)
    runtime.unpin_blas_threads(1, floor=4)  # fair share already higher
    assert runtime._blas_current == cpus
    runtime.unpin_blas_threads(cpus, floor=10 * cpus)  # capped
    assert runtime._blas_current == cpus
    runtime.pin_blas_threads(1)


def test_prepare_releases_lsh_projection_cache(spark):
    """After bh_tsne on the lsh_banded path, no banded-LSH projection
    DataFrame is left persisted (ADVICE r10: proj.persist was never
    released)."""
    from spark_tsne_spark.api import bh_tsne

    df = _points(spark, n=260, d=6, seed=3).cache()
    df.count()
    jvm_sc = spark.sparkContext._jsc.sc()
    before = jvm_sc.getPersistentRDDs().size()
    bh_tsne(
        df, max_iterations=2, perplexity=8.0, seed=1,
        knn_method="lsh_banded", local_threshold=0,
    )
    after = jvm_sc.getPersistentRDDs().size()
    # the adjacency cache itself may remain (owned by the result), but
    # the projection cache must not accumulate on top of it by more
    # than that one plan
    assert after - before <= 1, (before, after)
    df.unpersist()
