"""Round-10 pins: fp32-candidate/fp64-rescore kNN equivalence, the
workspace-spec contract shared with bench.py's warm-up, bounded
narrow-kernel BLAS sizing, and the Arrow null guard."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.operators.knn import (
    KNN_FP32_MIN_N,
    KNN_FP32_PAD,
    knn_exact_block,
    knn_lsh_banded,
    knn_workspace_spec,
)


def _rand_df(spark, n=600, d=16, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d)) * 10.0
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, features array<double>")


def _collect_knn(df):
    out = {}
    for r in df.collect():
        out[r["i"]] = (list(r["js"]), list(r["ds"]))
    return out


def test_fp32_rescue_equals_fp64_neighbors(spark, monkeypatch):
    """The fp32 candidate pass + fp64 rescore must select the SAME
    neighbor sets as the pure-fp64 pass and reproduce the distances to
    fp64 GEMM-vs-einsum noise (~1e-12 relative)."""
    df = _rand_df(spark)
    monkeypatch.setenv("SPARK_GRAFT_KNN_FP32", "0")
    ref = _collect_knn(knn_exact_block(df, k=20))
    monkeypatch.setenv("SPARK_GRAFT_KNN_FP32", "1")
    got = _collect_knn(knn_exact_block(df, k=20))
    assert set(ref) == set(got)
    for i in ref:
        js_ref, ds_ref = ref[i]
        js_got, ds_got = got[i]
        assert js_ref == js_got, f"row {i} neighbor set differs"
        np.testing.assert_allclose(ds_got, ds_ref, rtol=1e-10, atol=1e-9)


def test_fp32_rescue_equals_fp64_calibrated(spark, monkeypatch):
    """Same equivalence through the fused β-calibration path: identical
    neighbor ids, P values and β to rescore noise."""
    df = _rand_df(spark, n=400, d=12, seed=11)
    monkeypatch.setenv("SPARK_GRAFT_KNN_FP32", "0")
    ref = {
        r["i"]: (list(r["js"]), list(r["ps"]), r["beta"])
        for r in knn_exact_block(df, k=30, calibrate=(10.0, 1e-5)).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_KNN_FP32", "1")
    got = {
        r["i"]: (list(r["js"]), list(r["ps"]), r["beta"])
        for r in knn_exact_block(df, k=30, calibrate=(10.0, 1e-5)).collect()
    }
    assert set(ref) == set(got)
    for i in ref:
        assert ref[i][0] == got[i][0]
        np.testing.assert_allclose(got[i][1], ref[i][1], rtol=1e-8, atol=1e-12)
        np.testing.assert_allclose(got[i][2], ref[i][2], rtol=1e-8)


def test_workspace_spec_thresholds(monkeypatch):
    """Catalog/bench scales (sf0.01 and sf0.1 tables, the 2048-row
    t-SNE entries) stay pure fp64 — their value hashes must not move —
    while the 51.2k-row flagship gets the fp32 candidate buffer. The
    spec is the SAME function bench.py's warm-up pre-faults with."""
    monkeypatch.delenv("SPARK_GRAFT_KNN_FP32", raising=False)
    name, shape, dt = knn_workspace_spec(2048)
    assert name == "knn_d" and dt == np.float64
    assert shape == (256, 2048)
    name, shape, dt = knn_workspace_spec(KNN_FP32_MIN_N - 1)
    assert dt == np.float64
    name, shape, dt = knn_workspace_spec(51200)
    assert name == "knn_d32" and dt == np.float32
    assert shape == (256, 51200)
    # budget: the buffer never exceeds 256 MB regardless of n
    for n in (51200, 10_000_000):
        name, (ch, nn), dt = knn_workspace_spec(n)
        assert ch * nn * np.dtype(dt).itemsize <= 256 * 2**20
        assert ch >= 1
    # env force-switches (driver-side decision)
    monkeypatch.setenv("SPARK_GRAFT_KNN_FP32", "0")
    assert knn_workspace_spec(51200)[2] == np.float64
    monkeypatch.setenv("SPARK_GRAFT_KNN_FP32", "1")
    assert knn_workspace_spec(2048)[2] == np.float32


def test_fp32_pad_leaves_slack():
    assert KNN_FP32_PAD >= 16


def test_unpin_blas_is_bounded():
    """unpin_blas_threads sizes the pool to the worker's fair share of
    the cores given the stage's concurrency — never a flat restore to
    nproc (that re-created the 32×32 oversubscription)."""
    from spark_tsne_spark import runtime

    cpus = os.cpu_count() or 1
    if runtime._resolve_blas_setter() is None:
        pytest.skip("no OpenBLAS thread setter in this numpy build")
    runtime.unpin_blas_threads(cpus)  # cpus concurrent tasks → serial
    assert runtime._blas_current == 1
    runtime.unpin_blas_threads(1)  # solo task → full pool
    assert runtime._blas_current == cpus
    runtime.unpin_blas_threads(2)
    assert runtime._blas_current == max(1, cpus // 2)
    runtime.unpin_blas_threads(10 * cpus)  # over-parallel input: floor 1
    assert runtime._blas_current == 1
    runtime.pin_blas_threads(1)  # leave the test process serial


def test_null_features_fail_loudly(spark):
    """ListArray.flatten() drops null entries; a null feature row must
    raise (either from the guard or the fallback), never silently
    misalign ids with vectors."""
    rows = [(0, [1.0, 2.0]), (1, None), (2, [3.0, 4.0])]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    with pytest.raises(Exception):
        knn_exact_block(df, k=1).collect()


def _unit_df(spark, n=800, d=16, seed=3):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, features array<double>")


def test_lsh_banded_contract_and_recall(spark):
    """Banded LSH kNN: same output contract as knn_lsh (squared dist,
    rank ≤ k), exact distances for every pair it emits, and ≥0.8
    recall@k against the exact block kernel on random unit vectors —
    the structureless worst case for LSH."""
    df = _unit_df(spark).cache()
    df.count()
    k = 15
    exact = {
        (r["i"], int(j), round(float(d), 9))
        for r in knn_exact_block(df, k).collect()
        for j, d in zip(r["js"], r["ds"])
    }
    exact_pairs = {(i, j) for i, j, _ in exact}
    got = knn_lsh_banded(df, k).collect()
    assert all(1 <= r["rank"] <= k for r in got)
    by_i = {}
    for r in got:
        by_i.setdefault(r["i"], []).append(r)
    for i, rs in by_i.items():
        assert len(rs) <= k
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
    got_pairs = {(r["i"], r["j"]) for r in got}
    recall = len(got_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.8, f"recall {recall}"
    # every emitted distance is the true squared distance
    truth = {(i, j): d for i, j, d in exact}
    for r in got:
        key = (r["i"], r["j"])
        if key in truth:
            assert abs(round(float(r["dist"]), 9) - truth[key]) < 1e-6
    df.unpersist()


def test_lsh_banded_hot_bucket_shards(spark):
    """A planted block of IDENTICAL vectors (same hash in every table)
    larger than max_bucket is shard-salted, NOT dropped: every block
    member still gets neighbors (all other copies are at distance 0,
    so any shard peer is a correct top-k hit) — the round-10 gate
    silently erased such rows from the output (ADVICE r10). The
    uncapped run must agree."""
    rng = np.random.default_rng(9)
    base = [
        (int(i), [float(v) for v in rng.normal(size=8)]) for i in range(60)
    ]
    dup = [(1000 + i, [1.0] * 8) for i in range(40)]
    df = spark.createDataFrame(
        base + dup, "id long, features array<double>"
    ).cache()
    df.count()
    sharded = knn_lsh_banded(df, 5, max_bucket=20, bucket_width=0.5)
    rows = sharded.where(F.col("i") >= 1000).collect()
    covered = {r["i"] for r in rows}
    assert covered == {1000 + i for i in range(40)}, (
        "every member of an over-cap duplicate cluster must keep output"
    )
    # every emitted intra-block neighbor is another exact duplicate
    for r in rows:
        if r["j"] >= 1000:
            assert r["dist"] == 0.0
    intra = sum(1 for r in rows if r["j"] >= 1000)
    assert intra > 0
    open_ = knn_lsh_banded(df, 5, max_bucket=200, bucket_width=0.5)
    intra2 = open_.where((F.col("i") >= 1000) & (F.col("j") >= 1000)).count()
    assert intra2 > 0
    df.unpersist()


def test_lsh_banded_multiprobe_recall_no_worse(spark):
    """n_probe=2 adds boundary-adjacent bucket assignments: recall vs
    the exact kernel must be >= the single-probe run's on the same
    data (probing only ADDS candidate pairs), and every emitted
    distance stays exact."""
    df = _unit_df(spark, n=500, d=12, seed=21).cache()
    df.count()
    k = 10
    exact_pairs = {
        (r["i"], int(j))
        for r in knn_exact_block(df, k).collect()
        for j in r["js"]
    }

    def recall(n_probe):
        got = {
            (r["i"], r["j"])
            for r in knn_lsh_banded(df, k, n_probe=n_probe).collect()
        }
        return len(got & exact_pairs) / len(exact_pairs)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1, f"multi-probe recall {r2} < single-probe {r1}"
    df.unpersist()


def test_lsh_banded_coverage_warns_on_singletons(spark):
    """check_coverage=True warns when rows are singletons in every
    table (no bucket peers anywhere → no output rows)."""
    import warnings as _w

    from spark_tsne_spark.operators.knn import knn_lsh_banded_lists

    # two far-apart points at a tiny bucket width: each is alone in
    # its bucket in every table
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1e6, 1e6])], "id long, features array<double>"
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        knn_lsh_banded_lists(
            df, 3, bucket_width=1e-3, check_coverage=True
        )
        msgs = [str(x.message) for x in rec]
    assert any("no neighbors" in m for m in msgs), msgs


def test_lsh_banded_resources_unpersist(spark):
    """The resources hook hands back the persisted projection
    DataFrame so callers can release executor storage."""
    from spark_tsne_spark.operators.knn import knn_lsh_banded_lists

    df = _unit_df(spark, n=100, d=8, seed=5)
    res: list = []
    out = knn_lsh_banded_lists(df, 5, resources=res)
    out.count()
    assert len(res) == 1
    assert res[0].storageLevel.useMemory
    res[0].unpersist()
    assert not res[0].storageLevel.useMemory


def test_lsh_banded_partition_layout_invariance(spark):
    """Banded LSH output must be identical regardless of the input's
    partition layout: projections are seed-derived per worker, bucket
    kernels sort by id (shuffle arrival order can't reorder ties),
    and the merge is (dist, j)-tiebroken. This is what licenses the
    golden-parquet oracle across driver configurations."""
    df = _unit_df(spark, n=500, d=12, seed=5)
    a = {
        (r["i"], r["j"], r["rank"]): round(float(r["dist"]), 10)
        for r in knn_lsh_banded(df.repartition(1), 8).collect()
    }
    b = {
        (r["i"], r["j"], r["rank"]): round(float(r["dist"]), 10)
        for r in knn_lsh_banded(df.repartition(7), 8).collect()
    }
    assert a == b


def test_bh_tsne_lsh_banded_e2e_kl_decreases(spark, embeddings):
    """End-to-end bh_tsne on the banded-LSH affinity path: full
    coverage (one embedding row per input row) and a decreasing KL —
    the approximate kNN still feeds a functioning optimizer."""
    from spark_tsne_spark.api import bh_tsne

    res = bh_tsne(
        embeddings, max_iterations=25, perplexity=10.0, seed=3,
        id_col="vec_id", features="embedding",
        knn_method="lsh_banded", local_threshold=0,
    )
    assert res.Y.shape == (embeddings.count(), 2)
    # BH KL is computed on the reference's 10-iteration cadence, so 25
    # iterations yields (at least) two points — it must decrease
    losses = [l for _, l in res.losses if l is not None]
    assert len(losses) >= 2 and losses[-1] < losses[0]
