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
