"""Property tests for the feature-engineering operators: WOE/IV
binning, leave-one-out target encoding, Gini/Lorenz concentration,
and PSI drift."""

import math
import os

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_woe_iv_identities(spark):
    """WOE terms must satisfy the defining identities: bins partition
    the corpus (sum n = |orders|), each woe equals the hand-computed
    log-odds ratio, and iv_total = sum of iv terms with every term
    non-negative (IV terms are always >= 0 by construction)."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["orders_woe_iv"].fn(spark, SF).collect()
    assert [r["bin"] for r in rows] == [1, 2, 3, 4]
    n_orders = _t(spark, SF, "orders").count()
    assert sum(r["n"] for r in rows) == n_orders
    pos_tot = sum(r["n_pos"] for r in rows)
    neg_tot = sum(r["n_neg"] for r in rows)
    for r in rows:
        woe = math.log((r["n_pos"] * neg_tot) / (r["n_neg"] * pos_tot))
        assert round(woe, 6) == r["woe"]
        assert r["iv_term"] >= 0.0
    assert rows[0]["iv_total"] == round(sum(r["iv_term"] for r in rows), 6)


def test_target_encoding_loo_closed_form(spark):
    """The two LOO values per category must be exactly (pos-1)/(n-1)
    and pos/(n-1); the smoothed value must sit between the raw rate
    and the global prior (the shrinkage contract)."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["orders_target_encoding_loo"].fn(spark, SF).collect()
    assert len(rows) == 5  # the five market segments
    n_tot = sum(r["n"] for r in rows)
    pos_tot = sum(r["n_pos"] for r in rows)
    prior = pos_tot / n_tot
    for r in rows:
        assert r["enc_if_pos"] == round((r["n_pos"] - 1) / (r["n"] - 1), 6)
        assert r["enc_if_neg"] == round(r["n_pos"] / (r["n"] - 1), 6)
        raw = r["n_pos"] / r["n"]
        lo, hi = sorted((raw, prior))
        assert lo - 1e-9 <= r["enc_smoothed"] <= hi + 1e-9


def test_target_encoding_singleton_category_null_loo(spark):
    """A category with a single row has NO leave-one-out value (0/0);
    the smoothed m-estimate is the defined fallback and equals
    (y + m*prior)/(1 + m)."""
    from spark_tsne_spark.operators.features import target_encoding_loo

    df = spark.createDataFrame(
        [("a", 1), ("a", 0), ("a", 1), ("b", 1)], ["cat", "y"]
    )
    out = {r["category"]: r for r in target_encoding_loo(df, "cat", "y").collect()}
    assert out["b"]["enc_if_pos"] is None
    assert out["b"]["enc_if_neg"] is None
    prior = 3 / 4
    assert out["b"]["enc_smoothed"] == round((1 + 10 * prior) / 11, 6)
    assert out["a"]["enc_if_pos"] == 0.5  # (2-1)/(3-1)
    assert out["a"]["enc_if_neg"] == 1.0  # 2/(3-1)


def test_gini_lorenz_properties(spark):
    """Lorenz shares must be increasing, end exactly at 1.0, and the
    Gini must match a driver-side recomputation from the raw spend
    vector; 0 <= gini < 1."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["customers_gini_lorenz"].fn(spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 1.0
    gini = rows[0]["gini"]
    assert 0.0 <= gini < 1.0
    cents = sorted(
        r["cents"]
        for r in _t(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            )
        )
        .collect()
    )
    n, tot = len(cents), sum(cents)
    s1 = sum((i + 1) * x for i, x in enumerate(cents))
    assert round((2.0 * s1 - (n + 1.0) * tot) / (n * 1.0 * tot), 6) == gini


def test_psi_drift_term_identities(spark):
    """Per-type: bin counts partition that type's events, each psi
    term matches the smoothed closed form, terms are >= 0 (PSI terms
    are (p-q)ln(p/q) which is non-negative), and psi_total is the
    rounded sum of that type's rounded terms."""
    import math
    from collections import defaultdict

    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["events_psi_drift"].fn(spark, SF).collect()
    assert rows
    n_events = _t(spark, SF, "events").count()
    assert sum(r["n_before"] + r["n_after"] for r in rows) == n_events
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for et, rs in by_type.items():
        tb = sum(r["n_before"] for r in rs)
        ta = sum(r["n_after"] for r in rs)
        nb = len(rs)
        for r in rs:
            p = (r["n_before"] + 1) / (tb + nb)
            q = (r["n_after"] + 1) / (ta + nb)
            term = (p - q) * math.log(p / q)
            assert round(term, 6) == r["psi_term"]
            assert r["psi_term"] >= 0.0
        assert rs[0]["psi_total"] == round(sum(r["psi_term"] for r in rs), 6)
