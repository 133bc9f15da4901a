"""Property tests for the round-8f operators: positional delete
vectors, KS two-sample test, Mann-Whitney U, Zipf rank-frequency
fit."""

import math
import os
import re
from collections import Counter

from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _events_by_cohort(spark):
    from spark_tsne_spark.plans.queries import _t

    rows = _t(spark, SF, "events").select("user_id", "value").collect()
    a = sorted(r["value"] for r in rows if r["user_id"] % 2 == 0)
    b = sorted(r["value"] for r in rows if r["user_id"] % 2 == 1)
    return a, b


def test_positional_deletes_conservation(spark):
    """Per file: n_live + n_deleted == n_rows; files partition the
    corpus; every file deletes roughly 10% (hash-selected)."""
    from spark_tsne_spark.plans.queries import _t, catalog

    rows = catalog()["docs_positional_deletes"].fn(spark, SF).collect()
    n_docs = _t(spark, SF, "documents").count()
    assert sum(r["n_rows"] for r in rows) == n_docs
    for r in rows:
        assert r["n_live"] + r["n_deleted"] == r["n_rows"]
        assert r["n_deleted"] >= 0
    deleted = sum(r["n_deleted"] for r in rows)
    assert 0 < deleted < n_docs / 2


def test_positional_deletes_checksum_is_live_sum(spark):
    """The per-file checksum must equal the driver-side sum of the
    52-bit row hashes of exactly the surviving rows."""
    import hashlib
    from collections import defaultdict

    from spark_tsne_spark.plans.queries import _t, catalog

    docs = _t(spark, SF, "documents").select("doc_id", "text").collect()
    want = defaultdict(int)
    for d in docs:
        if int(hashlib.md5(f"del:{d['doc_id']}".encode()).hexdigest()[:15], 16) % 10 == 0:
            continue
        fid = d["doc_id"] // 100
        want[fid] += int(
            hashlib.md5(d["text"].encode()).hexdigest()[:13], 16
        )
    rows = catalog()["docs_positional_deletes"].fn(spark, SF).collect()
    for r in rows:
        assert r["live_checksum"] == want.get(r["file_id"], 0)


def test_ks_matches_brute_force(spark):
    """D must equal the brute-force two-sample sup gap computed
    driver-side over the pooled distinct values."""
    from spark_tsne_spark.plans.queries import catalog

    a, b = _events_by_cohort(spark)
    n0, n1 = len(a), len(b)
    ca, cb = Counter(a), Counter(b)
    cum0 = cum1 = 0
    best = -1
    for v in sorted(set(a) | set(b)):
        cum0 += ca.get(v, 0)
        cum1 += cb.get(v, 0)
        best = max(best, abs(cum0 * n1 - cum1 * n0))
    r = catalog()["events_ks_test"].fn(spark, SF).collect()[0]
    assert (r["n0"], r["n1"]) == (n0, n1)
    assert r["d_num"] == best
    assert r["d"] == round(best / (n0 * n1), 6)
    assert 0.0 <= r["p_approx"] <= 2.0


def test_mannwhitney_matches_scipy_formula(spark):
    """u_doubled must equal 2*U computed by the textbook rank-sum
    (average ranks for ties), and z the tie-corrected normal
    approximation."""
    from spark_tsne_spark.plans.queries import catalog

    a, b = _events_by_cohort(spark)
    pooled = sorted(a + b)
    # average rank per value (1-based)
    first = {}
    cnt = Counter(pooled)
    pos = 1
    for v in sorted(cnt):
        first[v] = pos
        pos += cnt[v]
    avg_rank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    r0 = sum(avg_rank[v] for v in a)
    n0, n1 = len(a), len(b)
    n = n0 + n1
    u0 = r0 - n0 * (n0 + 1) / 2
    tie = sum(c**3 - c for c in cnt.values())
    sigma2 = (n0 * n1 / 12) * ((n + 1) - tie / (n * (n - 1)))
    z = (u0 - n0 * n1 / 2) / math.sqrt(sigma2)
    r = catalog()["events_mannwhitney_u"].fn(spark, SF).collect()[0]
    assert r["u_doubled"] == round(2 * u0)
    assert r["tie_term"] == tie
    assert abs(r["z"] - z) < 1e-5


def test_zipf_fit_matches_numpy(spark):
    """The slope/intercept must match an lstsq fit on the same
    rounded log points; a natural-ish corpus slopes negative."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["vocab_zipf_fit"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 64
    xs = [r["lx"] for r in rows]
    ys = [r["ly"] for r in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(rows[0]["zipf_slope"] - round(slope, 6)) <= 1e-6
    assert rows[0]["zipf_slope"] < 0
    assert [r["rank"] for r in rows] == list(range(1, n + 1))
    tfs = [r["tf"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)
