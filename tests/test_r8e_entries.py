"""Property tests for the round-8e operators: cohort LTV matrix,
chi-square independence, Flesch readability, degree assortativity."""

import os
import re

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_ltv_cohort_conservation_and_monotone(spark):
    """The cohort matrix must conserve total revenue (sum of cell
    cents == sum of order cents), every cohort must have an age-0 row
    (the first order itself), and each cohort's cumulative must be
    strictly increasing in age."""
    from collections import defaultdict

    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["customers_ltv_cohort"].fn(spark, SF).collect()
    total = _t(spark, SF, "orders").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
    ).collect()[0][0]
    assert sum(r["cents"] for r in rows) == total
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_month"]].append(r)
    for month, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_months"])
        assert rs[0]["age_months"] == 0, month
        cums = [r["cum_cents"] for r in rs]
        assert cums == sorted(cums)
        assert cums[-1] == sum(r["cents"] for r in rs)


def test_chi2_identities(spark):
    """Each cell's chi2 term must match the (obs-exp)^2/exp closed
    form recomputed from the marginals; dof = (5-1)*(5-1); the total
    equals the rounded sum of rounded terms."""
    from collections import defaultdict

    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["orders_chi2_independence"].fn(spark, SF).collect()
    assert len(rows) == 25
    n = sum(r["obs"] for r in rows)
    row_tot = defaultdict(int)
    col_tot = defaultdict(int)
    for r in rows:
        row_tot[r["segment"]] += r["obs"]
        col_tot[r["priority"]] += r["obs"]
    for r in rows:
        exp = row_tot[r["segment"]] * col_tot[r["priority"]] / n
        assert round(exp, 6) == r["expected"]
        assert round((r["obs"] - exp) ** 2 / exp, 6) == r["chi2_term"]
        assert r["dof"] == 16
    assert rows[0]["chi2_total"] == round(sum(r["chi2_term"] for r in rows), 6)


def test_readability_matches_python_regex(spark):
    """The per-source counts must equal a driver-side re.findall
    recomputation, and the flesch column the closed form."""
    from collections import defaultdict

    from spark_tsne_spark.plans.queries import _t, catalog

    rows = {r["source"]: r for r in catalog()["docs_readability"].fn(spark, SF).collect()}
    docs = (
        _t(spark, SF, "documents")
        .where(F.length("text") > 0)
        .select("source", "text")
        .collect()
    )
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, sents, sylls
    for d in docs:
        a = agg[d["source"]]
        a[0] += 1
        a[1] += len(re.findall(r"\S+", d["text"]))
        a[2] += max(len(re.findall(r"[.!?]+", d["text"])), 1)
        a[3] += len(re.findall(r"[aeiouy]+", d["text"].lower()))
    assert set(agg) == set(rows)
    for src, (nd, w, s, y) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["words"], r["sentences"], r["syllables"]) == (
            nd,
            w,
            s,
            y,
        )
        assert r["flesch"] == round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4)


def test_assortativity_star_is_minus_one(spark):
    """A star graph is perfectly disassortative: every edge joins the
    hub (degree k) to a leaf (degree 1), so r = -1 exactly."""
    from spark_tsne_spark.operators.graph import degree_assortativity

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], ["i", "j"]
    )
    r = degree_assortativity(pairs).collect()[0]
    assert r["n_directed"] == 8
    assert r["assortativity"] == -1.0


def test_assortativity_complete_graph_degenerate(spark):
    """K4 is degree-regular: zero variance at both endpoints makes
    the Pearson ratio 0/0 -> NULL (NaN in SQL semantics) — the
    documented degenerate case, not a crash."""
    import math

    from spark_tsne_spark.operators.graph import degree_assortativity

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], ["i", "j"]
    )
    r = degree_assortativity(pairs).collect()[0]
    assert r["assortativity"] is None or math.isnan(r["assortativity"])


def test_assortativity_catalog_entry_bounded(spark):
    """The LSH-graph entry returns one row with r in [-1, 1]."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["dedup_graph_assortativity"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]["assortativity"]
    if r is not None:
        assert -1.0 - 1e-9 <= r <= 1.0 + 1e-9
