"""Property tests for the round-8n operators: nation lead-time p90
(grouped narrowing) and Heaps'-law vocabulary growth."""

import math
import os
import re
from collections import defaultdict

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_lead_time_p90_matches_sort_based(spark):
    """The narrowing must select exactly the rank-ceil(0.9 n) data
    value per nation that a full sort produces."""
    from spark_tsne_spark.plans.queries import _t, catalog

    li = _t(spark, SF, "lineitem")
    o = _t(spark, SF, "orders")
    sup = {
        s["s_suppkey"]: s["s_nationkey"]
        for s in _t(spark, SF, "supplier").collect()
    }
    nat = {
        n["n_nationkey"]: n["n_name"] for n in _t(spark, SF, "nation").collect()
    }
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("days"),
    ).collect()
    per = defaultdict(list)
    for r in j:
        per[nat[sup[r["l_suppkey"]]]].append(r["days"])
    want = {}
    for nation, days in per.items():
        days.sort()
        want[nation] = days[math.ceil(0.9 * len(days)) - 1]
    rows = catalog()["nation_lead_time_p90"].fn(spark, SF).collect()
    assert {r["nation"]: r["q_value"] for r in rows} == want


def test_heaps_law_curve_properties(spark):
    """Types and tokens are non-decreasing in the decile sequence,
    the final point covers the whole corpus (types == |vocab|,
    tokens == corpus token count), and beta lands in (0, 1]."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["text_heaps_law"].fn(spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    types = [r["types"] for r in rows]
    tokens = [r["tokens"] for r in rows]
    assert types == sorted(types)
    assert tokens == sorted(tokens)
    docs = _t(spark, SF, "documents").select("text").collect()
    vocab = set()
    n_tok = 0
    for d in docs:
        ts = [t for t in re.split(r"\s+", d["text"].strip()) if t]
        n_tok += len(ts)
        vocab.update(ts)
    assert rows[-1]["types"] == len(vocab)
    assert rows[-1]["tokens"] == n_tok
    # the synthetic fixture's 31-term vocabulary saturates in the
    # first decile, so beta legitimately hits 0 here; real corpora
    # land 0.4-0.6
    assert 0.0 <= rows[0]["heaps_beta"] <= 1.0


def test_heaps_fit_matches_normal_equations(spark):
    """beta/logK must match the OLS fit on the same rounded points."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["text_heaps_law"].fn(spark, SF).collect()
    xs = [round(math.log(r["tokens"]), 8) for r in rows]
    ys = [round(math.log(r["types"]), 8) for r in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(rows[0]["heaps_beta"] - beta) < 2e-6
    assert abs(rows[0]["heaps_logk"] - (sy - beta * sx) / n) < 2e-6
