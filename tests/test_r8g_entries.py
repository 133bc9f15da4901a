"""Property tests for the round-8g operators: Poisson bootstrap CI,
exact ACF, exact Pearson correlation matrix, Cohen's kappa,
sequential trigram paths."""

import math
import os
from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_bootstrap_ci_replica_identities(spark):
    """20 replicas, each mean an exact cents rational; the CI columns
    equal the rank-2 / rank-19 replica means; n_eff concentrates near
    n (Poisson(1) weights sum to ~n)."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["events_bootstrap_ci"].fn(spark, SF).collect()
    assert len(rows) == 20
    n = _t(spark, SF, "events").count()
    for r in rows:
        assert abs(r["n_eff"] - n) < 6 * math.sqrt(n) + 1
    means = sorted((r["mean_value"], r["replica"]) for r in rows)
    assert rows[0]["ci_lo"] == means[1][0]
    assert rows[0]["ci_hi"] == means[18][0]
    assert rows[0]["ci_lo"] <= rows[0]["ci_hi"]


def test_bootstrap_weight_is_poisson_inverse_cdf(spark):
    """A replica-0 weight recomputed driver-side from the same hash
    and integer thresholds must match the plan's n_eff for that
    replica."""
    import hashlib

    from spark_tsne_spark.plans.queries import (
        _BOOT_THRESHOLDS,
        _t,
        catalog,
    )

    ids = [
        r["event_id"]
        for r in _t(spark, SF, "events").select("event_id").collect()
    ]
    total = 0
    for eid in ids:
        h = int(hashlib.md5(f"boot:0:{eid}".encode()).hexdigest()[:13], 16)
        total += sum(1 for t in _BOOT_THRESHOLDS if h >= t)
    rows = catalog()["events_bootstrap_ci"].fn(spark, SF).collect()
    assert rows[0]["n_eff"] == total


def test_acf_matches_numpy(spark):
    """The integer-exact ACF must equal the float textbook estimator
    computed driver-side (within rounding), with acf(0)≡1 implied by
    the shared denominator and a sane lag-24 daily signal."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["events_autocorrelation"].fn(spark, SF).collect()
    assert [r["lag"] for r in rows] == list(range(1, 25))
    hc = (
        _t(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("y"))
        .orderBy("h")
        .collect()
    )
    y = [r["y"] for r in hc]
    n = len(y)
    mu = sum(y) / n
    den = sum((v - mu) ** 2 for v in y)
    for r in rows:
        k = r["lag"]
        num = sum((y[t] - mu) * (y[t + k] - mu) for t in range(n - k))
        assert abs(r["acf"] - num / den) < 2e-6
        assert r["n_pairs"] == n - k
        assert -1.0 <= r["acf"] <= 1.0


def test_correlation_matrix_matches_numpy(spark):
    """All six pairwise correlations must match numpy corrcoef on the
    integer-scaled columns; price–quantity correlates positively."""
    import numpy as np

    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["lineitem_correlation_matrix"].fn(spark, SF).collect()
    assert len(rows) == 6
    li = _t(spark, SF, "lineitem").select(
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias(
            "price_cents"
        ),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
    )
    pdf = li.toPandas()
    for r in rows:
        want = np.corrcoef(pdf[r["col_x"]], pdf[r["col_y"]])[0, 1]
        assert abs(r["pearson_r"] - want) < 2e-6
    by = {(r["col_x"], r["col_y"]): r["pearson_r"] for r in rows}
    assert ("qty", "price_cents") in by
    assert all(-1.0 <= v <= 1.0 for v in by.values())


def test_kappa_identities(spark):
    """Confusion cells partition the corpus; po/pe/kappa match the
    textbook closed forms; kappa in [-1, 1]."""
    from spark_tsne_spark.plans.queries import _t, catalog

    r = catalog()["docs_gate_agreement_kappa"].fn(spark, SF).collect()[0]
    n_docs = _t(spark, SF, "documents").count()
    assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == n_docs == r["n"]
    po = (r["n11"] + r["n00"]) / r["n"]
    pa1 = (r["n11"] + r["n10"]) / r["n"]
    pb1 = (r["n11"] + r["n01"]) / r["n"]
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    assert r["po"] == round(po, 6)
    assert r["pe"] == round(pe, 6)
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 2e-6
    assert -1.0 <= r["kappa"] <= 1.0


def test_trigram_paths_match_driver_recount(spark):
    """Top-20 paths, supports, distinct-user supports and ranks must
    equal a driver-side recomputation over the per-user ordered event
    streams."""
    from spark_tsne_spark.plans.queries import _t, catalog

    ev = (
        _t(spark, SF, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for e in ev:
        streams[e["user_id"]].append((e["ts"], e["event_id"], e["event_type"]))
    support = Counter()
    users = defaultdict(set)
    for uid, s in streams.items():
        s.sort()
        types = [x[2] for x in s]
        for i in range(len(types) - 2):
            p = ">".join(types[i : i + 3])
            support[p] += 1
            users[p].add(uid)
    top = sorted(support.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = catalog()["events_top_trigram_paths"].fn(spark, SF).collect()
    assert [(r["path"], r["support"]) for r in rows] == top
    for r in rows:
        assert r["n_users"] == len(users[r["path"]])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
