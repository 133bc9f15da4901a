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
