"""End-to-end t-SNE on embeddings.parquet (FIXTURES.md F6).

Statistical oracles (quirk Q8 — no cross-engine RNG parity): KL loss
decreases over the run, final Y is centered, output schema is stable,
and the 2-D embedding preserves the 64-D neighborhoods far better
than chance. (The synthetic ``label`` column is uncorrelated with the
embedding geometry — X-space kNN label agreement ≈ chance — so label
agreement is NOT a valid oracle here; neighborhood preservation is.)
"""

import numpy as np
import pytest

from spark_tsne_spark.api import bh_tsne, simple_tsne


def topk_neighbors(M, k=10):
    d2 = ((M[:, None, :] - M[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.argsort(d2, axis=1)[:, :k]


@pytest.fixture(scope="module")
def features_by_id(embeddings):
    rows = embeddings.select("vec_id", "embedding").collect()
    return {r["vec_id"]: r["embedding"] for r in rows}


def run_checks(res, features_by_id, n, k=10):
    assert res.Y.shape == (n, 2)
    assert len(res.ids) == n
    # recentered each iteration (TSNEHelper.scala:54-56)
    assert np.abs(res.Y.mean(axis=0)).max() < 1e-6
    # KL decreases: last loss < first loss
    ls = [l for _, l in res.losses]
    assert ls[-1] < ls[0]
    assert all(np.isfinite(l) for l in ls)
    X = np.array([features_by_id[int(i)] for i in res.ids], dtype=np.float64)
    nx, ny = topk_neighbors(X, k), topk_neighbors(res.Y, k)
    overlap = np.mean([len(set(a) & set(b)) / k for a, b in zip(nx, ny)])
    chance = k / (n - 1)
    assert overlap > 4 * chance, f"preservation {overlap} vs chance {chance}"


def test_simple_tsne_e2e(spark, embeddings, features_by_id):
    n = embeddings.count()
    res = simple_tsne(
        embeddings,
        max_iterations=120,
        perplexity=15.0,
        seed=42,
        id_col="vec_id",
        features="embedding",
    )
    run_checks(res, features_by_id, n)
    df = res.to_df(spark)
    assert df.columns == ["id", "y"]
    assert df.count() == n


def test_bh_tsne_e2e(spark, embeddings, features_by_id):
    n = embeddings.count()
    res = bh_tsne(
        embeddings,
        max_iterations=120,
        perplexity=15.0,
        theta=0.5,
        seed=42,
        id_col="vec_id",
        features="embedding",
    )
    run_checks(res, features_by_id, n)


def test_local_path_matches_distributed(spark, embeddings, features_by_id):
    """The adaptive driver-local fast path and the distributed
    mapInPandas path share the same kernel functions — same seed must
    give the same trajectory (up to BLAS reduction-order float noise
    in the kNN distances)."""
    kw = dict(
        max_iterations=10, perplexity=12.0, seed=3,
        id_col="vec_id", features="embedding",
    )
    loc = bh_tsne(embeddings, **kw)  # n=500 → local by default
    dist = bh_tsne(embeddings, local_threshold=0, **kw)  # force distributed
    assert np.array_equal(loc.ids, dist.ids)
    assert np.allclose(loc.Y, dist.Y, rtol=1e-4, atol=1e-8)
    le = simple_tsne(embeddings, **kw)
    de = simple_tsne(embeddings, local_threshold=0, **kw)
    assert np.allclose(le.Y, de.Y, rtol=1e-4, atol=1e-8)


def test_distributed_bh_e2e(spark, embeddings, features_by_id):
    """Full statistical checks on the forced-distributed loop (the
    default-path e2e above now runs local at this n)."""
    n = embeddings.count()
    res = bh_tsne(
        embeddings, max_iterations=120, perplexity=15.0, theta=0.5,
        seed=42, id_col="vec_id", features="embedding", local_threshold=0,
    )
    run_checks(res, features_by_id, n)


def test_bh_tsne_lsh_knn_path(spark, embeddings):
    """The approximate-kNN (LSH bucket-join) affinity path — the
    beyond-broadcast 100 TB route — must compose with the full loop:
    finite decreasing KL, right shape."""
    n = embeddings.count()
    res = bh_tsne(
        embeddings, max_iterations=80, perplexity=10.0, seed=5,
        id_col="vec_id", features="embedding", knn_method="lsh",
    )
    assert res.Y.shape == (n, 2)
    ls = [l for _, l in res.losses]
    assert all(np.isfinite(l) for l in ls)
    assert ls[-1] < ls[0]


def test_knn_method_auto_resolution():
    """'auto' must pick 'block' under the broadcast budget and the
    banded-LSH path above it (n·d·8 bytes); explicit choices pass
    through."""
    from spark_tsne_spark.api import KNN_BROADCAST_BUDGET_BYTES, _resolve_knn_method

    under = KNN_BROADCAST_BUDGET_BYTES // (64 * 8) - 1
    over = KNN_BROADCAST_BUDGET_BYTES // (64 * 8) + 1
    assert _resolve_knn_method("auto", under, 64) == "block"
    assert _resolve_knn_method("auto", over, 64) == "lsh_banded"
    assert _resolve_knn_method("lsh", under, 64) == "lsh"
    assert _resolve_knn_method("lsh_banded", under, 64) == "lsh_banded"
    assert _resolve_knn_method("block", over, 64) == "block"  # honored, warned


def test_knn_auto_over_budget_never_collects_matrix(spark, embeddings, monkeypatch):
    """With 'auto' above the broadcast budget, the full-matrix
    driver collect (knn_exact_block's toPandas) must never run — the
    10⁸-row user gets LSH, not a driver OOM."""
    import spark_tsne_spark.api as api_mod
    import spark_tsne_spark.operators.x2p as x2p_mod

    monkeypatch.setattr(api_mod, "KNN_BROADCAST_BUDGET_BYTES", 1)

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("knn_exact_block must not run above budget")

    monkeypatch.setattr(x2p_mod, "knn_exact_block", boom)
    res = bh_tsne(
        embeddings, max_iterations=3, perplexity=10.0, seed=5,
        id_col="vec_id", features="embedding", knn_method="auto",
        local_threshold=0,
    )
    assert res.Y.shape == (embeddings.count(), 2)


def test_determinism(spark, embeddings):
    a = simple_tsne(
        embeddings, max_iterations=5, perplexity=10.0, seed=7,
        id_col="vec_id", features="embedding",
    )
    b = simple_tsne(
        embeddings, max_iterations=5, perplexity=10.0, seed=7,
        id_col="vec_id", features="embedding",
    )
    assert np.array_equal(a.Y, b.Y)


def test_clustered_pipeline_f5(spark):
    """FIXTURES.md F5: MNIST-shaped pipeline on synthetic Gaussian
    clusters — limit → global standardize → PCA → BH t-SNE; cluster
    identity must survive the embedding (kNN label agreement far above
    chance)."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.operators.preprocess import (
        global_stats,
        pca_project,
        standardize,
    )

    rng = np.random.default_rng(42)
    n_per, n_clusters, dim = 100, 3, 64
    centers = rng.standard_normal((n_clusters, dim)) * 6
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.standard_normal((n_per, dim))
        for k, p in enumerate(pts):
            rows.append((c * n_per + k, c, [float(v) for v in p]))
    df = spark.createDataFrame(rows, "id long, label int, features array<double>").cache()

    mean, std = global_stats(df)
    z = standardize(df, mean, std)
    z16 = pca_project(z, k=16).cache()
    z16.count()

    res = bh_tsne(
        z16, max_iterations=60, perplexity=20.0, seed=1,
        id_col="id", features="features",
    )
    labels = np.array([int(i) // n_per for i in res.ids])
    nn = topk_neighbors(res.Y, k=10)
    agreement = np.mean([np.mean(labels[nn[i]] == labels[i]) for i in range(len(labels))])
    assert agreement > 0.85, f"kNN label agreement {agreement}"  # chance = 1/3


def test_to_df_without_arrow(spark):
    """Regression (round 3): sessions where Arrow conversion is off (or
    falls back) take ``_createFromLocal``, whose verifier rejects
    numpy.float64 elements for ArrayType(DoubleType). ``to_df`` must
    emit plain-Python floats so both paths accept the frame."""
    from spark_tsne_spark.api import TSNEResult

    res = TSNEResult(
        ids=np.arange(5, dtype=np.int64),
        Y=np.arange(10, dtype=np.float64).reshape(5, 2) / 7.0,
        losses=[(0, 1.0)],
    )
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        rows = res.to_df(spark).orderBy("id").collect()
    finally:
        spark.conf.set(key, prev)
    assert [r["id"] for r in rows] == list(range(5))
    got = np.array([r["y"] for r in rows])
    np.testing.assert_allclose(got, res.Y)
    # and the Arrow path still works
    assert res.to_df(spark).count() == 5
