"""Round-12 pins: Morton tree builder equivalence + banded-LSH edge
fixes (ADVICE r11)."""

import warnings

import numpy as np
import pytest


def _tree_cases():
    rng = np.random.default_rng(0)
    Y = rng.normal(size=(5000, 2))
    Yd = rng.normal(size=(2000, 2))
    Yd[100:600] = Yd[5]  # planted duplicate mega-cluster
    Yz = rng.normal(size=(1000, 2))
    Yz[:, 1] = 3.25  # zero-width dimension
    Yc = rng.normal(size=(200, 2))
    Yc[10] = Yc[20] + 1e-14  # distinct points below 31-level key
    # resolution: forces a second Morton super-step
    Yk = np.concatenate(
        [rng.normal(size=(3000, 2)) * 0.01 + [10, 10],
         rng.normal(size=(3000, 2))]
    )
    return [
        ("random2d", Y, {}),
        ("random2d_coarse", Y, dict(leaf_size=32)),
        ("random3d", rng.normal(size=(3000, 3)), {}),
        ("dups", Yd, {}),
        ("dups_coarse", Yd, dict(leaf_size=8)),
        ("zerowidth", Yz, {}),
        ("allsame", np.full((50, 2), 1.5), {}),
        ("single", rng.normal(size=(1, 2)), {}),
        ("maxdepth", rng.normal(size=(500, 2)), dict(max_depth=3)),
        ("maxdepth_coarse", rng.normal(size=(500, 2)),
         dict(max_depth=3, leaf_size=4)),
        ("deep_supersteps", Yc, {}),
        ("deep_coarse", Yc, dict(leaf_size=3)),
        ("clustered_coarse", Yk, dict(leaf_size=32)),
        ("dim1", rng.normal(size=(800, 1)), {}),
        ("dim4_coarse", rng.normal(size=(1500, 4)), dict(leaf_size=8)),
    ]


@pytest.mark.parametrize(
    "name,Y,kw", _tree_cases(), ids=[c[0] for c in _tree_cases()]
)
def test_morton_build_matches_level_sort(name, Y, kw):
    """The Morton builder emits BIT-IDENTICAL structure to the r11
    level-sort builder — counts, children, leaf flags, radii,
    leaf_start and the packed leaf rows (same (slot, original-index)
    order). Centers may differ at ~ulp level only (per-node sums
    accumulate via bincount's sequential adds vs reduceat's unrolled
    pairwise blocks)."""
    from spark_tsne_spark.sptree import FlatTree

    Y = np.asarray(Y, dtype=np.float64)
    a = FlatTree.build(Y, method="level", **kw)
    b = FlatTree.build(Y, method="morton", **kw)
    assert a.n_nodes == b.n_nodes
    assert (a.count == b.count).all()
    assert (a.children == b.children).all()
    assert (a.leaf == b.leaf).all()
    assert (a.radius_sq == b.radius_sq).all()
    assert (a.leaf_start == b.leaf_start).all()
    if len(a.leaf_pts) or len(b.leaf_pts):
        # same MEMBER MULTISET per coarse leaf; the Morton builder
        # packs rows in Morton order, the level builder in original-
        # index order (walk-accumulation ulps only)
        assert a.leaf_pts.shape == b.leaf_pts.shape
        for slot in np.flatnonzero(a.leaf_start >= 0):
            s = a.leaf_start[slot]
            c = a.count[slot]
            ra = np.asarray(a.leaf_pts)[s:s + c]
            rb = np.asarray(b.leaf_pts)[b.leaf_start[slot]:b.leaf_start[slot] + c]
            ra = ra[np.lexsort(ra.T)]
            rb = rb[np.lexsort(rb.T)]
            assert (ra == rb).all()
    np.testing.assert_allclose(a.center, b.center, rtol=1e-12, atol=1e-13)


def test_morton_walk_matches_level_sort():
    """Non-edge forces from the two builders agree to float tolerance
    (identical structure; only ulp-level center noise differs) — the
    'pinned-equal walk result' gate for the Morton build."""
    from spark_tsne_spark.sptree import FlatTree, non_edge_forces

    rng = np.random.default_rng(11)
    Y = rng.normal(size=(4000, 2)) * 4.0
    Y[100:150] = Y[7]
    for kw in ({}, dict(leaf_size=32)):
        a = FlatTree.build(Y, method="level", **kw)
        b = FlatTree.build(Y, method="morton", **kw)
        fa, qa = non_edge_forces(a, Y, 0.5)
        fb, qb = non_edge_forces(b, Y, 0.5)
        np.testing.assert_allclose(qb, qa, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(fb, fa, rtol=1e-10, atol=1e-12)


def test_morton_theta0_is_exact():
    """θ=0 ≡ brute force for the Morton builder directly (same gate
    the level-sort builder carries in test_r11_fixes)."""
    from spark_tsne_spark.sptree import FlatTree, non_edge_forces

    rng = np.random.default_rng(17)
    # duplicates only in the coarse case: a FINE leaf holding n
    # duplicates has a center that rounds off the exact point
    # (sum-of-11-copies/11 ≠ the point bitwise), so the exact-equality
    # self-exclusion misses — a pre-existing quirk of BOTH builders
    # (reference-identical arithmetic), not a Morton property. The
    # coarse leaf expands per member row with per-point exclusion and
    # IS exact under duplicates.
    for kw, plant in (({}, False), (dict(leaf_size=16), True)):
        Y = rng.normal(size=(400, 2)) * 5.0
        if plant:
            Y[50:60] = Y[10]
        diff = Y[:, None, :] - Y[None, :, :]
        d2 = (diff * diff).sum(axis=2)
        with np.errstate(divide="ignore"):
            q = 1.0 / (1.0 + d2)
        np.fill_diagonal(q, 0.0)
        q[d2 == 0] = 0.0
        ref_q = q.sum(axis=1)
        ref_f = ((q * q)[:, :, None] * diff).sum(axis=1)
        tree = FlatTree.build(Y, method="morton", **kw)
        got_f, got_q = non_edge_forces(tree, Y, theta=0.0)
        np.testing.assert_allclose(got_q, ref_q, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(got_f, ref_f, rtol=1e-9, atol=1e-12)


def test_build_auto_dispatch():
    """auto == level-sort below MORTON_MIN_ROWS (bit-exact INCLUDING
    centers — the pinned-golden regime) and == morton at/above it."""
    from spark_tsne_spark.sptree import FlatTree

    rng = np.random.default_rng(3)
    Y = rng.normal(size=(3000, 2))
    a = FlatTree.build(Y)
    b = FlatTree.build(Y, method="level")
    assert (a.center == b.center).all()
    assert (a.children == b.children).all()
    old = FlatTree.MORTON_MIN_ROWS
    try:
        FlatTree.MORTON_MIN_ROWS = 1000
        c = FlatTree.build(Y)
        d = FlatTree.build(Y, method="morton")
        assert (c.center == d.center).all()
        assert (c.children == d.children).all()
    finally:
        FlatTree.MORTON_MIN_ROWS = old


def test_morton_pickle_roundtrip():
    import pickle

    from spark_tsne_spark.sptree import FlatTree, non_edge_forces

    rng = np.random.default_rng(31)
    Y = rng.normal(size=(300, 2))
    tree = FlatTree.build(Y, leaf_size=8, method="morton")
    tree2 = pickle.loads(pickle.dumps(tree))
    f1, q1 = non_edge_forces(tree, Y, theta=0.4)
    f2, q2 = non_edge_forces(tree2, Y, theta=0.4)
    assert (f1 == f2).all() and (q1 == q2).all()


def test_bucket_kernel_offset_guard():
    """The Arrow bucket kernel refuses emissions whose flat size would
    wrap int32 list offsets (ADVICE r11: silent np.int32 arange wrap
    at extreme max_bucket·k corrupts neighbor lists)."""
    import inspect

    from spark_tsne_spark.operators import knn

    src = inspect.getsource(knn)
    assert "m * kl < 2**31" in src  # the guard exists before casting


def test_coverage_counts_match_actual_emitters(spark):
    """check_coverage's covered-row count equals the number of rows
    that actually emit output — including asymmetric multi-probe,
    where probe VISITORS must not count toward a bucket's candidate
    occupancy (ADVICE r11)."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.operators.knn import knn_lsh_banded_lists

    rng = np.random.default_rng(9)
    # two tight clusters + one extreme outlier (singleton everywhere)
    X = np.concatenate(
        [rng.normal(size=(30, 4)), rng.normal(size=(30, 4)) + 50.0,
         [[1e6, 1e6, 1e6, 1e6]]]
    )
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(X)],
        "id long, features array<double>",
    )
    for probe_index in (True, False):
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            out = knn_lsh_banded_lists(
                df, k=3, num_tables=2, n_probe=2,
                probe_index=probe_index, check_coverage=True, seed=7,
            )
            emitters = out.select("i").distinct().count()
        cov_warn = [
            w for w in wlist if "share no bucket" in str(w.message)
        ]
        dropped = 0
        if cov_warn:
            dropped = int(str(cov_warn[0].message).split(" of ")[0].split()[-1])
        assert 61 - dropped == emitters, (probe_index, dropped, emitters)


def test_banded_width_memo(spark):
    """Repeat banded-LSH calls with identical (input plan, dials) hit
    the session width memo and return identical results."""
    from spark_tsne_spark.operators import knn as K

    rng = np.random.default_rng(5)
    X = rng.normal(size=(80, 4))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(X)],
        "id long, features array<double>",
    )
    K._BANDED_WIDTH_MEMO.clear()
    a = K.knn_lsh_banded(df, k=3, num_tables=2).toPandas()
    assert len(K._BANDED_WIDTH_MEMO) == 1
    b = K.knn_lsh_banded(df, k=3, num_tables=2).toPandas()
    assert len(K._BANDED_WIDTH_MEMO) == 1
    pa = a.sort_values(["i", "rank"]).reset_index(drop=True)
    pb = b.sort_values(["i", "rank"]).reset_index(drop=True)
    assert pa.equals(pb)


def test_probe_tau_gate(spark):
    """probe_tau (VERDICT r11 #5): tau >= 0.5 is bit-identical to the
    ungated multi-probe; a tight tau keeps the recall between
    single-probe and full multi-probe (with the width held fixed so
    candidate sets are comparable)."""
    from spark_tsne_spark.operators.knn import (
        derive_bucket_length,
        knn_exact_block,
        knn_lsh_banded_lists,
    )

    rng = np.random.default_rng(3)
    X = rng.standard_normal((600, 8))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(X)],
        "id long, features array<double>",
    ).cache()
    df.count()
    w = derive_bucket_length(df, quantile=0.15, seed=42) * 2.0

    def pairs(**kw):
        nn = knn_lsh_banded_lists(
            df, 5, num_tables=4, bucket_width=w, seed=42, **kw
        )
        return {(r.i, j) for r in nn.collect() for j in r.js}

    p_full = pairs(n_probe=2)
    p_over = pairs(n_probe=2, probe_tau=0.7)  # >= 0.5: no gate
    assert p_over == p_full
    p_one = pairs(n_probe=1)
    p_tau = pairs(n_probe=2, probe_tau=0.2)
    gt = {(r.i, j) for r in knn_exact_block(df, 5).collect() for j in r.js}

    def recall(s):
        return len(gt & s) / len(gt)

    # the gate trades a sliver of the probe's recall for its cost;
    # it must keep a strict improvement over single-probe here
    assert recall(p_one) < recall(p_tau) <= recall(p_full) + 1e-12
    df.unpersist()


def test_bh_gradient_pass_arrow_matches_pandas(spark):
    """The round-12 Arrow-native BH pass (mapInArrow, zero-copy list
    flatten) emits BIT-IDENTICAL rows to the r11 mapInPandas +
    bh_block path on a varying-length adjacency — same ids, same
    force vectors, same KL partials, to the last bit."""
    from spark_tsne_spark.gradient import (
        GRAD_SCHEMA,
        bh_block,
        bh_gradient_pass,
    )
    from spark_tsne_spark.sptree import FlatTree

    rng = np.random.default_rng(7)
    n = 400
    Y = rng.standard_normal((n, 2)) * 1e-2
    ids = np.arange(n, dtype=np.int64)
    rows = []
    for i in range(n):
        k = int(rng.integers(3, 13))  # varying lengths exercise the
        js = rng.choice(n, size=k, replace=False)  # offsets math
        ps = rng.random(k) / (k * n)
        rows.append((int(i), [int(j) for j in js], [float(p) for p in ps]))
    adj = spark.createDataFrame(
        rows, "i long, js array<long>, ps array<double>"
    ).repartition(4, "i")
    tree = FlatTree.build(Y)
    sc = spark.sparkContext
    bc_state = sc.broadcast((Y, tree))
    bc_ids = sc.broadcast(ids)
    theta, ex = 0.5, 12.0

    def run_old(batches):
        Yv, treev = bc_state.value
        idsv = bc_ids.value
        for pdf in batches:
            if len(pdf):
                yield bh_block(pdf, Yv, treev, idsv, theta, ex)

    old = (
        adj.mapInPandas(run_old, GRAD_SCHEMA)
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    new = (
        bh_gradient_pass(adj, bc_state, bc_ids, theta, ex)
        .toPandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    assert (old["i"].to_numpy() == new["i"].to_numpy()).all()
    for col in ("znum", "ploss", "psum"):
        assert (old[col].to_numpy() == new[col].to_numpy()).all(), col
    for col in ("posF", "negF"):
        a = np.vstack(old[col].to_numpy())
        b = np.vstack(new[col].to_numpy())
        assert (a == b).all(), col
    bc_state.destroy()
    bc_ids.destroy()


def test_affinity_probe_tau_env_dial(monkeypatch):
    """SPARK_GRAFT_LSH_AFFINITY_PROBETAU forwards to the banded kNN
    call of the affinity path; unset keeps the ungated r11 default."""
    import spark_tsne_spark.operators.x2p as x2p_mod

    captured = {}

    def fake_lists(df, mu, id_col, features, **kw):
        captured.update(kw)
        raise RuntimeError("stop-after-capture")

    monkeypatch.setattr(
        "spark_tsne_spark.operators.knn.knn_lsh_banded_lists", fake_lists
    )
    for env_val, expect in ((None, None), ("0.2", 0.2)):
        captured.clear()
        if env_val is None:
            monkeypatch.delenv(
                "SPARK_GRAFT_LSH_AFFINITY_PROBETAU", raising=False
            )
        else:
            monkeypatch.setenv(
                "SPARK_GRAFT_LSH_AFFINITY_PROBETAU", env_val
            )
        with pytest.raises(RuntimeError, match="stop-after-capture"):
            x2p_mod.calibrated_neighbors(
                object(), perplexity=30.0, method="lsh_banded"
            )
        assert captured["probe_tau"] == expect
        assert captured["num_tables"] == 6
        assert captured["n_probe"] == 2
