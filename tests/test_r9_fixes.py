"""Regression tests for the round-8 VERDICT findings (round-9 fixes).

Each test pins the exact posture gap the judge described:
1. events_theil_sen's quadratic pair join must be GATED in code:
   series longer than TSEN_MAX_POINTS are deterministically
   stride-subsampled before pairing (capped == uncapped on small
   series; bounded point count on long ones);
2. part_similar_items' per-basket self-join must carry a hot-basket
   cap: a planted pathological basket is dropped, bounding the pair
   fan-out, while TPC-H-sized baskets pass through untouched;
3. embedding_procrustes_align must not ship the planted rotation as
   a d^2 nested-literal Column (4,096 Catalyst nodes at d=64) — the
   rotation rides the mapInPandas closure instead.
"""

import os

import pytest
from pyspark.sql import Row, functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


# ---------------------------------------------------------------- Theil-Sen


def _mk_series(spark, n):
    return spark.createDataFrame(
        [Row(y=(i * 7) % 13 + i // 3, h=i + 1) for i in range(n)]
    ).select(F.col("y").cast("long"), F.col("h").cast("long"))


def test_tsen_gate_identity_below_cap(spark):
    """n <= cap => stride 1 => every row survives bit-identically."""
    from spark_tsne_spark.plans.queries import _tsen_gate

    idx = _mk_series(spark, 120)
    out = _tsen_gate(idx, cap=120).orderBy("h").collect()
    ref = idx.orderBy("h").collect()
    assert out == ref


def test_tsen_gate_bounds_points_deterministically(spark):
    """n > cap => ceil(n/cap)-stride keep: at most cap survivors, the
    SAME survivors every run (rank-based, not sampled), and original
    h values preserved so pair slopes use true time distances."""
    from spark_tsne_spark.plans.queries import _tsen_gate

    idx = _mk_series(spark, 1000)
    kept = _tsen_gate(idx, cap=100).orderBy("h").collect()
    # stride = ceil(1000/100) = 10 -> h in {1, 11, 21, ...}
    assert len(kept) == 100
    assert [r["h"] for r in kept] == list(range(1, 1001, 10))
    again = _tsen_gate(idx, cap=100).orderBy("h").collect()
    assert kept == again


def test_tsen_entry_pair_join_is_gated(spark):
    """The catalog entry itself routes through the gate (not just a
    helper that exists): its plan carries the stride filter."""
    from spark_tsne_spark.plans.queries import catalog

    df = catalog()["events_theil_sen"].fn(spark, SF)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "_stride" in plan, "entry does not route through _tsen_gate"


# ---------------------------------------------------------- similar items


def _mk_baskets(spark, hot_parts):
    """3 small baskets + one planted hot basket with `hot_parts`
    distinct parts (each part also appears in one small basket so
    dropping the hot basket never empties cnt)."""
    rows = []
    for ok, parts in [(1, [10, 11]), (2, [10, 12]), (3, [11, 12])]:
        rows += [Row(l_orderkey=ok, l_partkey=p) for p in parts]
    rows += [Row(l_orderkey=99, l_partkey=1000 + i) for i in range(hot_parts)]
    return spark.createDataFrame(rows)


def test_basket_gate_drops_planted_hot_basket(spark):
    from spark_tsne_spark.plans.queries import _basket_gate

    oi = _mk_baskets(spark, hot_parts=1000)
    kept = _basket_gate(oi, cap=64)
    assert kept.where(F.col("l_orderkey") == 99).count() == 0
    assert kept.count() == 6  # the three small baskets, untouched
    # pair fan-out is now bounded: without the gate the hot basket
    # alone contributes C(1000, 2) = 499,500 pairs
    a = kept.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("i"))
    b = kept.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("j"))
    pairs = a.join(b, "ok").where(F.col("i") < F.col("j")).count()
    assert pairs == 3


def test_basket_gate_identity_on_small_baskets(spark):
    from spark_tsne_spark.plans.queries import _basket_gate

    oi = _mk_baskets(spark, hot_parts=5)
    kept = _basket_gate(oi, cap=64)
    assert kept.count() == oi.count()
    assert sorted(kept.collect()) == sorted(oi.collect())


def test_itemsim_entry_routes_through_gate(spark):
    from spark_tsne_spark.plans.queries import catalog

    df = catalog()["part_similar_items"].fn(spark, SF)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "_bsz" in plan, "entry does not route through _basket_gate"


def test_itemsim_sql_and_spark_carry_same_cap():
    from spark_tsne_spark.plans.queries import (
        ITEMSIM_MAX_BASKET,
        _REGISTRY,
    )

    sql = _REGISTRY["part_similar_items"].sql
    assert f"bsz <= {ITEMSIM_MAX_BASKET}" in sql


def test_tsen_sql_and_spark_carry_same_cap():
    from spark_tsne_spark.plans.queries import TSEN_MAX_POINTS, _REGISTRY

    sql = _REGISTRY["events_theil_sen"].sql
    assert f"// {TSEN_MAX_POINTS})" in sql.replace(
        f"+ {TSEN_MAX_POINTS - 1})", "+X)"
    ) or f"// {TSEN_MAX_POINTS}" in sql


# -------------------------------------------------------------- procrustes


def test_procrustes_plan_has_no_literal_matrix(spark):
    """The planted rotation must NOT be a d^2 nested-F.lit Column:
    at d=64 that is a 4,096-node Catalyst expression compiled per
    run (and the wrong shape entirely at d=1024). After the fix the
    rotation rides the Arrow kernel's closure, so the analyzed plan
    of the alignment job stays small. The entry collects internally,
    so count literals in the logical plan it builds for Y via the
    operator module instead: the returned result still matches the
    golden (covered by test_r8o/test_oracle); here we pin the plan
    shape by rebuilding the Y construction the entry uses."""
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    d = len(emb.first()["embedding"])
    rng = np.random.default_rng(20240815)
    A = rng.standard_normal((d, d))
    Q, Rq = np.linalg.qr(A)
    Q = Q * np.sign(np.diag(Rq))
    Qb = np.ascontiguousarray(Q, dtype=np.float64)

    def _rotate(batches):
        import pandas as _pd

        for pdf in batches:
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            yield _pd.DataFrame(
                {"vec_id": pdf["vec_id"], "embedding": list(X @ Qb)}
            )

    y = emb.mapInPandas(_rotate, "vec_id long, embedding array<double>")
    plan = y._jdf.queryExecution().analyzed().toString()
    assert plan.count("array(") < 16, "literal matrix leaked into the plan"
    # and the kernel really rotates: one row spot-check
    row = y.where(F.col("vec_id") == emb.first()["vec_id"]).first()
    x0 = np.array(emb.first()["embedding"], dtype=np.float64)
    assert np.allclose(np.array(row["embedding"]), x0 @ Qb, atol=1e-9)


def test_procrustes_entry_source_has_no_nested_lit():
    """Source-level pin: the entry must not rebuild the literal
    matrix (F.array(*[F.array(*[F.lit(...)  ...) pattern)."""
    import inspect

    from spark_tsne_spark.plans import queries as Q

    src = inspect.getsource(Q.embedding_procrustes_align)
    assert "F.lit(float(v))" not in src
    assert "mapInPandas" in src


# ----------------------------------------------------- batch β calibration


def test_calibrate_rows_bit_identical_to_scalar():
    """The vectorized bisection must reproduce _calibrate_row EXACTLY
    (same betas, same probabilities, bit for bit) — it replaces the
    scalar loop inside the fused kNN+calibration pass, whose output
    feeds the hash-checked x2p oracle."""
    import math

    import numpy as np

    from spark_tsne_spark.operators.x2p import _calibrate_row, _calibrate_rows

    rng = np.random.default_rng(123)
    # mixed regimes: ordinary rows, tiny distances (beta grows), huge
    # distances (exp underflow -> zero-sum guard), constant rows
    blocks = [
        rng.random((200, 90)) * 10,
        rng.random((50, 90)) * 1e-8,
        rng.random((50, 90)) * 1e4,          # exp(-d) underflows at beta=1
        np.full((5, 90), 3.14),
        np.zeros((3, 90)),
    ]
    D = np.concatenate(blocks)
    perm = rng.permutation(len(D))
    D = D[perm]
    log_u = math.log(30.0)
    betas, P = _calibrate_rows(D, log_u, 1e-5)
    for r in range(len(D)):
        b_ref, p_ref = _calibrate_row(D[r].copy(), log_u, 1e-5)
        assert betas[r] == b_ref, r
        assert np.array_equal(P[r], p_ref), r


def test_flat_tree_build_matches_insert_path_after_vectorization():
    """Array-accumulator rewrite of FlatTree.build: node order, counts,
    centers, radii, leaf flags and child links all equal the
    SPTree-insert flattening (the original invariant), re-pinned on a
    fresh point set."""
    import numpy as np

    from spark_tsne_spark.sptree import FlatTree, SPTree

    rng = np.random.default_rng(77)
    Y = np.concatenate(
        [rng.standard_normal((400, 2)) * 0.01, rng.standard_normal((100, 2)) * 3 + 5]
    )
    Y[50] = Y[10]  # duplicate point (leaf duplicate semantics)
    built = FlatTree.build(Y)
    ref = FlatTree.from_sptree(SPTree.from_matrix(Y))
    # same multiset of OCCUPIED nodes (the insert path materializes
    # empty sibling cells the bulk build never allocates — they carry
    # no mass and the walk skips them)
    def canon(t):
        occ = t.count > 0
        c, n_, r, lf = t.center[occ], t.count[occ], t.radius_sq[occ], t.leaf[occ]
        key = np.lexsort((n_, r, c[:, 1], c[:, 0]))
        return c[key], n_[key], r[key], lf[key]

    bc, bn, br, bl = canon(built)
    rc, rn, rr, rl = canon(ref)
    assert bc.shape == rc.shape
    assert np.allclose(bc, rc) and (bn == rn).all()
    assert np.allclose(br, rr) and (bl == rl).all()


# ------------------------------------------------- HOF lambda outer refs


def _lambda_bodies(plan: str) -> str:
    """Concatenated lambdafunction(...) fragments of a plan string."""
    import re

    return " ".join(re.findall(r"lambdafunction\([^)]*", plan))


def test_word_ngrams_lambda_has_no_expensive_outer_refs(spark):
    """word_ngrams must not re-evaluate split()/trim() per element:
    the zip_with form keeps the tokenization at row level (the r9
    2.7s -> 0.54s explode fix). A regression reintroduces split()
    inside a lambdafunction."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.functions.text import char_shingles, word_ngrams

    d = spark.createDataFrame([("a b c d e",)], "text string")
    plan = (
        d.select(F.explode(word_ngrams("text", 3)))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    bodies = _lambda_bodies(plan)
    assert "split(" not in bodies, bodies
    # char_shingles: no substring/lower re-derivation per element
    plan2 = (
        d.select(F.explode(char_shingles(F.lower("text"), 3)))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    bodies2 = _lambda_bodies(plan2)
    assert "lower(" not in bodies2, bodies2
    assert "substring(" not in bodies2, bodies2


def test_project_barrier_blocks_collapse(spark):
    """project_barrier must keep the fenced alias OUT of downstream
    HOF lambdas (CollapseProject would otherwise inline lower(text)
    into the shingle transform and re-lower the doc per trigram)."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.functions.text import project_barrier

    d = spark.createDataFrame([("ABCDEF",)], "text string")
    fenced = project_barrier(d, F.lower("text").alias("_t"))
    out = fenced.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("_t") - 2),
                lambda i: F.substring(F.col("_t"), i, 3),
            )
        ).alias("g")
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "lower(" not in _lambda_bodies(plan), plan
    assert [r.g for r in out.collect()] == ["abc", "bcd", "cde", "def"]
