"""Round-13 (optimization round 2) focused tests.

Covers the VERDICT r12 / ADVICE r12 fixes:
- ANN driver-side query fan-out is bounded: a query table above the
  collect guard takes the retained distributed kernel; small query
  tables keep the driver-local path (and both produce equal rows).
- SPARK_GRAFT_LSH_AFFINITY_PROBETAU parsing: positive floats only,
  unset/empty = ungated, zero/garbage raise a named error.
- The BH Arrow kernel's null-adjacency guard raises its descriptive
  error (not an opaque numpy cast failure) on null list entries.
"""

import numpy as np
import pytest


# ------------------------------------------------ probe_tau env parsing


def test_probe_tau_env_unset_and_empty_are_none(monkeypatch):
    from spark_tsne_spark.operators.x2p import _probe_tau_from_env

    monkeypatch.delenv("SPARK_GRAFT_LSH_AFFINITY_PROBETAU", raising=False)
    assert _probe_tau_from_env() is None
    monkeypatch.setenv("SPARK_GRAFT_LSH_AFFINITY_PROBETAU", "")
    assert _probe_tau_from_env() is None


def test_probe_tau_env_positive_float(monkeypatch):
    from spark_tsne_spark.operators.x2p import _probe_tau_from_env

    monkeypatch.setenv("SPARK_GRAFT_LSH_AFFINITY_PROBETAU", "0.2")
    assert _probe_tau_from_env() == 0.2


@pytest.mark.parametrize("bad", ["0", "-0.5", "abc", "0.0"])
def test_probe_tau_env_rejects_nonpositive_and_garbage(monkeypatch, bad):
    from spark_tsne_spark.operators.x2p import _probe_tau_from_env

    monkeypatch.setenv("SPARK_GRAFT_LSH_AFFINITY_PROBETAU", bad)
    with pytest.raises(ValueError, match="SPARK_GRAFT_LSH_AFFINITY_PROBETAU"):
        _probe_tau_from_env()


# ------------------------------------------- BH kernel null-list guard


class _Box:
    def __init__(self, value):
        self.value = value


def test_bh_arrow_run_null_js_raises_descriptive_error():
    import pyarrow as pa

    from spark_tsne_spark.gradient import _make_bh_arrow_run
    from spark_tsne_spark.sptree import FlatTree

    Y = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    ids = np.array([1, 2, 3], dtype=np.int64)
    tree = FlatTree.build(Y, leaf_size=1)
    run = _make_bh_arrow_run(_Box((Y, tree)), _Box(ids), 0.5, 1.0)
    rb = pa.record_batch(
        {
            "i": pa.array([1, 2], type=pa.int64()),
            "js": pa.array([[2, 3], None], type=pa.list_(pa.int64())),
            "ps": pa.array([[0.5, 0.5], [1.0]], type=pa.list_(pa.float64())),
        }
    )
    with pytest.raises(ValueError, match="null entries in adjacency"):
        list(run(iter([rb])))


def test_bh_arrow_run_clean_batch_passes():
    import pyarrow as pa

    from spark_tsne_spark.gradient import _make_bh_arrow_run
    from spark_tsne_spark.sptree import FlatTree

    Y = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    ids = np.array([1, 2, 3], dtype=np.int64)
    tree = FlatTree.build(Y, leaf_size=1)
    run = _make_bh_arrow_run(_Box((Y, tree)), _Box(ids), 0.5, 1.0)
    rb = pa.record_batch(
        {
            "i": pa.array([1, 2], type=pa.int64()),
            "js": pa.array([[2, 3], [1]], type=pa.list_(pa.int64())),
            "ps": pa.array([[0.5, 0.5], [1.0]], type=pa.list_(pa.float64())),
        }
    )
    out = list(run(iter([rb])))
    assert len(out) == 1 and out[0].num_rows == 2


# --------------------------------------- ANN local-query-fanout guard


def _mk_queries(spark, n, d=4):
    rows = [
        (int(i), [float((i * 7 + j * 3) % 11) + 0.1 for j in range(d)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_local_query_cells_small_stays_driver_local(spark):
    from pyspark.sql import functions as F

    from spark_tsne_spark.operators.similarity import _local_query_cells

    C = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    q = _mk_queries(spark, 10).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    out = _local_query_cells(q, C, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "MapInPandas" not in plan


def test_local_query_cells_large_falls_back_distributed(spark, monkeypatch):
    from pyspark.sql import functions as F

    from spark_tsne_spark.operators.similarity import _local_query_cells

    monkeypatch.setenv("SPARK_GRAFT_ANN_LOCAL_QMAX", "8")
    C = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    q = _mk_queries(spark, 20).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    out = _local_query_cells(q, C, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan

    # rows equal to the driver-local path (bit-equal fan-out)
    monkeypatch.setenv("SPARK_GRAFT_ANN_LOCAL_QMAX", "65536")
    ref = _local_query_cells(q, C, 2)
    got = sorted(
        tuple((r["id"], tuple(r["v"]), r["cell"])) for r in out.collect()
    )
    want = sorted(
        tuple((r["id"], tuple(r["v"]), r["cell"])) for r in ref.collect()
    )
    assert got == want


def test_local_pq_query_cells_large_falls_back_distributed(spark, monkeypatch):
    from pyspark.sql import functions as F

    from spark_tsne_spark.operators.similarity import _local_pq_query_cells

    monkeypatch.setenv("SPARK_GRAFT_ANN_LOCAL_QMAX", "8")
    C = np.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]])
    q = _mk_queries(spark, 20).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    out = _local_pq_query_cells(q, C, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan

    monkeypatch.setenv("SPARK_GRAFT_ANN_LOCAL_QMAX", "65536")
    ref = _local_pq_query_cells(q, C, 2)
    got = sorted(
        tuple((r["qid"], r["cell"], tuple(np.round(r["qv"], 12))))
        for r in out.collect()
    )
    want = sorted(
        tuple((r["qid"], r["cell"], tuple(np.round(r["qv"], 12))))
        for r in ref.collect()
    )
    assert got == want


# -------------------------------------------- width-tune recall floor


def _dup_dense_df(spark, n_bases=2, copies=1000, d=48, seed=5):
    """Duplicate-dense synthetic input at the failure's essential
    geometry: big jitter clouds (cloud ≫ max_bucket in the tests
    below) in HIGH dimension, where distance concentration makes the
    k-th neighbor as far as the typical in-cloud pair — so a width
    below the in-cloud scale fragments every neighborhood (the 3.16M
    collapse, SCALE.md r12), while low-d fixtures hide it (nearest
    neighbors there are much closer than typical pairs and survive
    fragmentation)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    bases = rng.normal(size=(n_bases, d)) * 50.0
    X = np.repeat(bases, copies, axis=0)
    X += rng.uniform(0, 0.1, size=X.shape)
    base_ix = np.repeat(np.arange(n_bases), copies)
    copy_ix = np.tile(np.arange(copies), n_bases)
    ids = copy_ix * n_bases + base_ix
    pdf = pd.DataFrame({"id": ids, "f": list(X)})
    return spark.createDataFrame(pdf), ids, X


def _true_topk(ids, X, kk):
    """Exact top-k id sets per row (numpy, test-scale)."""
    order = np.argsort(ids)
    Xs, ids_s = X[order], np.asarray(ids)[order]
    sq = (Xs * Xs).sum(axis=1)
    true = {}
    for qi in range(len(Xs)):
        dd = sq - 2.0 * (Xs @ Xs[qi]) + sq[qi]
        dd[qi] = np.inf
        idx = np.argpartition(dd, kk - 1)[:kk]
        true[int(ids_s[qi])] = set(int(j) for j in ids_s[idx])
    return true


def test_width_floor_blocks_neighborhood_splitting_halvings(spark):
    """Persistent over-cap pressure (occupancy_target=0 + clouds far
    above max_bucket) makes the flops-only tune halve straight past
    the in-cloud neighbor scale and true-top-k recall collapses
    (0.07 here — the 3.16M 0.50 mechanism, harder at test dials).
    The default floor refuses the halving that would cross 2× the
    exact k-th-neighbor distance: recall 0.83 at the shipped 6×2
    dials. The floor only ever BLOCKS halvings, so inputs that never
    halve (all goldens/bench shapes) are untouched."""
    from spark_tsne_spark.operators import knn as K

    df, ids, X = _dup_dense_df(spark)
    kk = 10
    true = _true_topk(ids, X, kk)

    def recall(rows):
        by_i = {r["i"]: set(r["js"][:kk]) for r in rows}
        return sum(len(true[i] & js) for i, js in by_i.items()) / (
            len(ids) * kk
        )

    K._BANDED_WIDTH_MEMO.clear()
    nofloor = K.knn_lsh_banded_lists(
        df, kk, id_col="id", features="f", max_bucket=64,
        occupancy_target=0.0, num_tables=6, n_probe=2,
        width_floor_scale=0.0,
    ).collect()
    k0 = set(K._BANDED_WIDTH_MEMO)
    floored = K.knn_lsh_banded_lists(
        df, kk, id_col="id", features="f", max_bucket=64,
        occupancy_target=0.0, num_tables=6, n_probe=2,
    ).collect()
    (w0, _, fb0) = next(iter(K._BANDED_WIDTH_MEMO[x] for x in k0))
    (w1, _, fb1) = next(
        K._BANDED_WIDTH_MEMO[x] for x in K._BANDED_WIDTH_MEMO if x not in k0
    )
    assert not fb0 and fb1, (fb0, fb1)
    assert w1 > w0, (w0, w1)
    r0, r1 = recall(nofloor), recall(floored)
    assert r1 >= 0.75, (r0, r1)
    assert r0 <= 0.3, (r0, r1)


def test_sampled_occupancy_probes_match_full_counts(spark, monkeypatch):
    """Above OCC_SAMPLE_MIN_N the tune's occupancy probes run on a
    deterministic hash sample with a full-table verification count;
    on the duplicate-dense fixture the sampled tune must choose the
    same width and produce identical neighbor lists."""
    from spark_tsne_spark.operators import knn as K

    df, ids, _X = _dup_dense_df(spark)

    K._BANDED_WIDTH_MEMO.clear()
    full = K.knn_lsh_banded_lists(
        df, 10, id_col="id", features="f", max_bucket=64,
        occupancy_target=0.0,
    ).collect()
    w_full = sorted(w for (w, _, _) in K._BANDED_WIDTH_MEMO.values())

    monkeypatch.setattr(K, "OCC_SAMPLE_MIN_N", 1000)
    monkeypatch.setattr(K, "OCC_SAMPLE_ROWS", 512)
    K._BANDED_WIDTH_MEMO.clear()
    sampled = K.knn_lsh_banded_lists(
        df, 10, id_col="id", features="f", max_bucket=64,
        occupancy_target=0.0,
    ).collect()
    w_sampled = sorted(w for (w, _, _) in K._BANDED_WIDTH_MEMO.values())
    assert w_full == w_sampled
    key = lambda r: (r["i"], tuple(r["js"]), tuple(np.round(r["ds"], 9)))
    assert sorted(map(key, full)) == sorted(map(key, sampled))
    K._BANDED_WIDTH_MEMO.clear()


def test_kth_neighbor_floor_sees_in_cloud_scale(spark):
    """The floor pass is exact-vs-full, so on duplicate-dense data it
    returns the in-cloud neighbor distance (~0.3 here), far below the
    inter-cloud scale; a bounded ROW sample of so few duplicates would
    see ~the inter-cloud distance instead (the defect the floor
    fixes). Uses many small clouds so the ORDER-BY-id row sample is
    duplicate-free like the real corpus."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.operators.knn import _kth_neighbor_floor

    df, ids, _X = _dup_dense_df(spark)
    proj = df.select("id", F.col("f").cast("array<double>").alias("f"))
    floor = _kth_neighbor_floor(proj, 10, sample_q=64)
    assert 0.05 < floor < 1.0, floor


# ------------------------------------------- staged table groups (10M)


def test_table_groups_match_one_shot(spark):
    """table_groups=G runs the L tables as G sequential bounded
    sub-passes (the 10M peak-disk lever); the merged result must be
    identical to the one-shot pass — per-group top-k then merge-of-
    groups equals global top-k, including shard-salted buckets and
    probe visitors."""
    from spark_tsne_spark.operators import knn as K

    df, ids, _X = _dup_dense_df(spark, n_bases=8, copies=64, d=16)

    kw = dict(
        id_col="id", features="f", max_bucket=64, num_tables=6,
        n_probe=2, bucket_width=1.0,
    )
    one = K.knn_lsh_banded_lists(df, 7, **kw).collect()
    key = lambda r: (r["i"], tuple(r["js"]), tuple(np.round(r["ds"], 9)))
    for g in (2, 3):
        staged = K.knn_lsh_banded_lists(df, 7, table_groups=g, **kw).collect()
        assert sorted(map(key, staged)) == sorted(map(key, one)), g


# ---------------------------------------- per-iteration AQE scoping


def test_distributed_loop_runs_with_aqe_off_and_restores(spark, embeddings):
    """The distributed iteration loop disables AQE (its per-iteration
    job is a fixed shuffle-less plan; AdaptiveSparkPlan wrapping is
    pure re-planning overhead) and restores the conf afterwards,
    including mid-loop as observed by callbacks."""
    from spark_tsne_spark.api import bh_tsne

    seen = []

    def cb(it, Y, loss):
        seen.append(spark.conf.get("spark.sql.adaptive.enabled"))

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    res = bh_tsne(
        embeddings.limit(64), max_iterations=2, perplexity=5.0, seed=3,
        id_col="vec_id", features="embedding", local_threshold=0,
        callback=cb,
    )
    assert len(res.ids) == 64
    assert seen == ["false", "false"]
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_local_loop_keeps_aqe_untouched(spark, embeddings):
    from spark_tsne_spark.api import bh_tsne

    seen = []

    def cb(it, Y, loss):
        seen.append(spark.conf.get("spark.sql.adaptive.enabled"))

    bh_tsne(
        embeddings.limit(64), max_iterations=2, perplexity=5.0, seed=3,
        id_col="vec_id", features="embedding", callback=cb,
    )
    assert seen == ["true", "true"]


# ------------------------------------------- arrow-collect assembly


def test_assemble_arrow_matches_pandas():
    """assemble_arrow over a chunked Arrow table must reproduce
    assemble over the equivalent pandas frame BIT-exactly (forces,
    Z, loss) — the collect-path switch may not move the embedding
    by one ulp."""
    import pandas as pd
    import pyarrow as pa

    from spark_tsne_spark.gradient import assemble, assemble_arrow

    rng = np.random.default_rng(7)
    n, d = 257, 3
    ids_sorted = np.arange(n, dtype=np.int64)
    # two chunks with a ragged split, rows shuffled like a collect
    perm = rng.permutation(n)
    posF = rng.normal(size=(n, d))
    negF = rng.normal(size=(n, d))
    znum = rng.normal(size=n) ** 2 + 0.5
    ploss = rng.normal(size=n)
    psum = rng.normal(size=n) ** 2

    def batch(sl):
        k = len(perm[sl])
        offs = np.arange(0, (k + 1) * d, d, dtype=np.int32)
        return pa.record_batch(
            [
                pa.array(perm[sl].astype(np.int64)),
                pa.ListArray.from_arrays(
                    offs, pa.array(posF[perm[sl]].reshape(-1))
                ),
                pa.ListArray.from_arrays(
                    offs, pa.array(negF[perm[sl]].reshape(-1))
                ),
                pa.array(znum[perm[sl]]),
                pa.array(ploss[perm[sl]]),
                pa.array(psum[perm[sl]]),
            ],
            names=["i", "posF", "negF", "znum", "ploss", "psum"],
        )

    tbl = pa.Table.from_batches([batch(slice(0, 100)), batch(slice(100, n))])
    pdf = tbl.to_pandas()
    pdf["posF"] = pdf["posF"].apply(list)
    pdf["negF"] = pdf["negF"].apply(list)
    for mode in ("bh", "exact"):
        dY_p, Z_p, loss_p = assemble(pdf, ids_sorted, n, d, mode)
        dY_a, Z_a, loss_a = assemble_arrow(tbl, ids_sorted, n, d, mode)
        assert Z_a == Z_p
        assert loss_a == loss_p
        assert np.array_equal(dY_a, dY_p)


def test_distributed_loop_arrow_collect_bitexact(spark, embeddings):
    """End-to-end: the distributed loop's toArrow collect path yields
    the bit-identical embedding to the toPandas path."""
    import os

    from spark_tsne_spark.api import bh_tsne

    df = embeddings.limit(96).cache()
    df.count()
    kw = dict(
        max_iterations=3, perplexity=5.0, seed=11,
        id_col="vec_id", features="embedding", local_threshold=0,
    )
    try:
        os.environ["SPARK_GRAFT_TSNE_ARROW_COLLECT"] = "0"
        r_pd = bh_tsne(df, **kw)
        os.environ["SPARK_GRAFT_TSNE_ARROW_COLLECT"] = "1"
        r_ar = bh_tsne(df, **kw)
    finally:
        os.environ.pop("SPARK_GRAFT_TSNE_ARROW_COLLECT", None)
        df.unpersist()
    assert np.array_equal(r_pd.ids, r_ar.ids)
    assert np.array_equal(r_pd.Y, r_ar.Y)
    assert r_pd.losses == r_ar.losses


def test_local_adjacency_batched_calibration_bitexact():
    """_local_adjacency's batched β calibration must reproduce the
    per-row scalar loop bit-exactly (adjacency ids, neighbor lists,
    and every p value)."""
    import math

    import pandas as pd

    from spark_tsne_spark.api import _local_adjacency
    from spark_tsne_spark.operators.x2p import _calibrate_row

    rng = np.random.default_rng(5)
    n, dim, perp, tol = 300, 16, 12.0, 1e-5
    pdf = pd.DataFrame(
        {
            "i": rng.permutation(n).astype(np.int64),
            "f": list(rng.normal(size=(n, dim))),
        }
    )
    adj, ids = _local_adjacency(pdf, perp, tol)
    # scalar reference, same chunking-independent math
    order = np.argsort(pdf["i"].to_numpy(np.int64), kind="stable")
    X = np.array(pdf["f"].tolist(), dtype=np.float64)[order]
    ids_ref = pdf["i"].to_numpy(np.int64)[order]
    mu = min(int(3 * perp), n - 1)
    log_u = math.log(perp)
    sq = (X * X).sum(axis=1)
    d = sq[:, None] + sq[None, :] - 2.0 * (X @ X.T)
    np.maximum(d, 0.0, out=d)
    d[np.arange(n), np.arange(n)] = np.inf
    from spark_tsne_spark.operators.affinities import P_CLAMP

    jpos_all = np.empty((n, mu), dtype=np.int64)
    ps_all = np.empty((n, mu), dtype=np.float64)
    for r in range(n):
        idx = np.argpartition(d[r], mu - 1)[:mu]
        _, p = _calibrate_row(d[r, idx], log_u, tol)
        jpos_all[r] = idx
        ps_all[r] = p
    ipos = np.repeat(np.arange(n, dtype=np.int64), mu)
    jpos = jpos_all.ravel()
    key = np.concatenate([ipos * n + jpos, jpos * n + ipos])
    val = np.concatenate([ps_all.ravel(), ps_all.ravel()])
    uk, inv = np.unique(key, return_inverse=True)
    pj = np.maximum(np.bincount(inv, weights=val) / (2.0 * n), P_CLAMP)
    si = (uk // n).astype(np.int64)
    sj = (uk % n).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(np.bincount(si, minlength=n))])
    assert np.array_equal(adj["i"].to_numpy(np.int64), ids_ref)
    for r in range(n):
        assert adj["js"][r] == ids_ref[sj[offs[r]: offs[r + 1]]].tolist()
        assert adj["ps"][r] == pj[offs[r]: offs[r + 1]].tolist()


def test_centroid_literal_sql_matches_lit_tree(spark):
    """The SQL-string centroid literal must evaluate to exactly the
    per-F.lit construction: same schema, bit-identical doubles
    (repr round-trips through Spark's double-literal parser)."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.operators.clustering import _centroid_literal

    rng = np.random.default_rng(13)
    cents = [
        (i, [float(x) for x in rng.normal(size=7) * 10.0 ** rng.integers(-8, 8)])
        for i in range(5)
    ]
    # include exact decimals and negatives like post-round centroids
    cents.append((5, [0.123456789, -42.0, 1e-12, -1.5e8, 0.0, 3.0, -0.25]))
    ref = F.array(
        *[
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("c"),
            )
            for cid, vec in cents
        ]
    )
    df = spark.range(1).select(
        _centroid_literal(cents).alias("a"), ref.alias("b")
    )
    assert df.schema["a"].dataType == df.schema["b"].dataType
    row = df.head()
    for sa, sb in zip(row["a"], row["b"]):
        assert sa["cid"] == sb["cid"]
        va = np.array(sa["c"])
        vb = np.array(sb["c"])
        assert np.array_equal(va, vb)
