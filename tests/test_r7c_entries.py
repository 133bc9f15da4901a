"""Property tests for the round-7c additions (bloom semi-join,
curation funnel report, MMR diversified top-k) — invariants the
Spark==DuckDB oracle check can't express."""

import numpy as np
from pyspark.sql import functions as F

from spark_tsne_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def test_bloom_semijoin_exact_even_with_tiny_bloom(spark):
    """Correctness must never depend on the Bloom's false-positive
    rate: a deliberately saturated 64-bit bloom (FP rate ~1) still
    yields exactly the semi join, because the verify join removes
    every false positive."""
    from spark_tsne_spark.operators.joins import bloom_semijoin

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    want = sorted(
        r["o_orderkey"]
        for r in orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
            "o_custkey",
            "left_semi",
        ).collect()
    )
    for m_bits in (64, 1 << 20):
        got = sorted(
            r["o_orderkey"]
            for r in bloom_semijoin(
                orders, cust, "o_custkey", "c_custkey", m_bits=m_bits
            ).collect()
        )
        assert got == want, m_bits


def test_bloom_prefilter_actually_prunes(spark):
    """With a well-sized bloom, the pre-filter alone (before the
    verify join) must keep every true match and prune most
    non-matches — the property that makes the pattern worth its
    broadcast at 100 TB."""
    from spark_tsne_spark.operators import joins as J

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keys = np.array([1, 7, 31], dtype=np.int64)
    m_bits, k = 1 << 20, 4
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    J._set_bits(bitmap, J._positions(keys, m_bits, k))
    probe = orders.select("o_custkey").toPandas()["o_custkey"].to_numpy(np.int64)
    pos = J._positions(probe, m_bits, k)
    member = np.ones(len(probe), dtype=bool)
    for i in range(k):
        p = pos[:, i]
        member &= (bitmap[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
    true_match = np.isin(probe, keys)
    assert (member | ~true_match).all()  # no false negatives, ever
    fp = (member & ~true_match).sum() / max(1, (~true_match).sum())
    assert fp < 0.01, fp


def test_funnel_stages_are_monotone_and_match_filter_chain(spark):
    """Each funnel stage is a subset of the previous, and the one-pass
    conditional-window totals equal a literal stage-by-stage refilter
    of the corpus."""
    from spark_tsne_spark.functions.text import fingerprint
    from pyspark.sql import Window

    out = {r["stage"]: (r["docs"], r["chars"]) for r in
           Q.corpus_funnel_report(spark, SF).collect()}
    assert list(out) == sorted(out)
    docs_seq = [out[s][0] for s in sorted(out)]
    chars_seq = [out[s][1] for s in sorted(out)]
    assert docs_seq == sorted(docs_seq, reverse=True)
    assert chars_seq == sorted(chars_seq, reverse=True)

    d = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = d.where(F.col("n_chars").between(80, 400))
    s2 = s1.where(F.col("lang") == "en")
    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    s3 = s2.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    w2 = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    s4 = s3.withColumn("rn2", F.row_number().over(w2)).where("rn2 <= 20")
    for stage, df in [("0_raw", d), ("1_len", s1), ("2_lang", s2),
                      ("3_dedup", s3), ("4_cap", s4)]:
        n, c = df.count(), (df.agg(F.sum("n_chars")).head()[0] or 0)
        assert out[stage] == (n, c), stage


def test_mmr_first_pick_is_argmax_and_selection_is_greedy(spark, embeddings):
    """Re-run the greedy locally from the candidate head and pin the
    whole selection; also check the diversity contract (every later
    pick's MMR score uses the max-sim against ALL previous picks)."""
    from spark_tsne_spark.operators.similarity import mmr_rerank

    k, n_cand, lam = 6, 25, 0.7
    got = [
        (r["rank"], r["vec_id"], r["score"])
        for r in mmr_rerank(
            embeddings, query_id=0, k=k, n_candidates=n_cand, lam=lam
        ).collect()
    ]
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    q = Xn[ids.tolist().index(0)]
    rel_all = np.round(Xn @ q, 6)
    mask = ids != 0
    order = sorted(np.where(mask)[0], key=lambda i: (-rel_all[i], ids[i]))
    cand = order[:n_cand]
    rel = rel_all[cand]
    sims = np.round(Xn[cand] @ Xn[cand].T, 6)
    sel, remaining = [], list(range(len(cand)))
    expect = []
    for step in range(k):
        if not sel:
            b = min(remaining, key=lambda i: (-rel[i], ids[cand[i]]))
            s = float(rel[b])
        else:
            mmr = np.round(
                lam * rel[remaining]
                - (1 - lam) * sims[np.ix_(remaining, sel)].max(axis=1),
                6,
            )
            j = min(range(len(remaining)),
                    key=lambda t: (-mmr[t], ids[cand[remaining[t]]]))
            b, s = remaining[j], float(mmr[j])
        expect.append((step + 1, int(ids[cand[b]]), s))
        sel.append(b)
        remaining.remove(b)
    assert got == expect
    assert len({v for _, v, _ in got}) == k  # distinct picks


def test_lsh_recall_metrics_are_consistent(spark):
    """n_hit <= min(n_truth, n_cand); rates in [0,1]; and exact
    duplicates (Jaccard 1) are ALWAYS candidates — identical shingle
    sets give identical signatures, so banding cannot miss them."""
    row = Q.dedup_lsh_recall(spark, SF).head()
    assert row["n_hit"] <= min(row["n_truth"], row["n_cand"])
    assert 0.0 <= row["recall"] <= 1.0
    assert 0.0 <= row["precision_at_t"] <= 1.0

    from spark_tsne_spark.functions.text import fingerprint
    from spark_tsne_spark.operators.dedup import minhash_lsh_candidates

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where((F.col("doc_id") < 200) & (F.length("text") >= 5))
    )
    fp = docs.select("doc_id", fingerprint("text").alias("fp"))
    a, b = fp.alias("a"), fp.alias("b")
    exact_pairs = {
        (r["i"], r["j"])
        for r in a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .collect()
    }
    cand = {
        (r["i"], r["j"])
        for r in minhash_lsh_candidates(
            docs, num_hashes=8, band_size=2, shingle_k=5
        ).collect()
    }
    assert exact_pairs <= cand


def test_wap_publish_roundtrip_and_staging_cleared(spark):
    """A clean audit must leave ONLY the published dir (staging was
    renamed away), the census must equal the direct computation, and
    a re-run must be idempotent."""
    import hashlib
    import os
    import tempfile

    from spark_tsne_spark.functions.text import fingerprint
    from pyspark.sql import Window

    for _ in range(2):  # idempotent under re-run
        row = Q.corpus_wap_publish(spark, SF).head()
    assert row["published"] is True
    tag = hashlib.md5(SF.encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"spark_tsne_wap_{tag}")
    assert os.path.isdir(base + "_published")
    assert not os.path.exists(base + "_staging")

    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    direct = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
    )
    assert row["n_docs"] == direct.count()
    assert row["n_distinct_id"] == row["n_docs"]
    assert row["n_null_id"] == 0


def test_ab_test_cohorts_partition_and_t_replay(spark):
    """Cohort counts partition each type's events, assignment is the
    deterministic hash (re-derivable), and the Welch t equals a local
    replay from the same rounded atoms."""
    import math

    rows = {r["event_type"]: r for r in Q.events_ab_test(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    totals = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert set(rows) == set(totals)
    for t, r in rows.items():
        assert r["n_a"] + r["n_b"] == totals[t]
        got_t = r["welch_t"]
        want_t = round(
            (r["mean_a"] - r["mean_b"])
            / math.sqrt(r["var_a"] / r["n_a"] + r["var_b"] / r["n_b"]),
            6,
        )
        assert got_t == want_t, t


def test_cusum_flags_the_argmax_and_total_deviation_is_zero(spark):
    """The scaled CUSUM sums to zero over the full range by
    construction (H*T - H*T), and the flagged hour is the argmax of
    |cusum| in a literal per-hour replay."""
    out = {r["event_type"]: r for r in
           Q.events_cusum_changepoint(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    c = (
        ev.groupBy("event_type",
                   F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in c:
        per[r["event_type"]].append((r["h"], r["n"]))
    for t, hours in per.items():
        hours.sort()
        H = len(hours)
        T = sum(n for _, n in hours)
        run, best = 0, None
        for idx, (h, n) in enumerate(hours, start=1):
            run += n
            cs = H * run - idx * T
            if best is None or abs(cs) > abs(best[1]):
                best = (h, cs)
        assert best is not None
        # full-range deviation is exactly zero
        assert H * run - H * T == 0
        assert (out[t]["change_hour"], out[t]["cusum_scaled"]) == best, t


def test_volume_trend_slope_is_exact_ols(spark):
    """slope_num/slope_den are the exact integer OLS moments; the
    rounded ratio matches a local replay, and a synthetic perfectly
    linear series recovers its slope exactly."""
    rows = Q.events_volume_trend(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["slope_per_hour"] == round(
            r["slope_num"] / r["slope_den"], 8
        )
    # synthetic: y = 3h + 7 -> slope exactly 3
    from spark_tsne_spark.plans.queries import events_volume_trend  # noqa: F401

    pdf = spark.createDataFrame(
        [(h, 3 * h + 7) for h in range(1, 25)], "h long, y long"
    )
    s = pdf.agg(
        F.count("*").alias("n"), F.sum("h").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("h") * F.col("y")).alias("sxy"),
        F.sum(F.col("h") * F.col("h")).alias("sxx"),
    ).head()
    num = s["n"] * s["sxy"] - s["sx"] * s["sy"]
    den = s["n"] * s["sxx"] - s["sx"] * s["sx"]
    assert num / den == 3.0


def test_forget_users_census_partitions_and_matches_anti_join(spark):
    """removed + kept = total per type, and kept equals the actual
    broadcast anti-join purge the census prices."""
    from spark_tsne_spark.operators.sampling import hash_bucket

    rows = {r["event_type"]: r for r in
            Q.events_forget_users(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    forget = (
        ev.select("user_id")
        .where(hash_bucket(F.col("user_id").cast("string"), "forget:")
               % 100 == 0)
        .distinct()
    )
    purged = ev.join(forget, "user_id", "left_anti")
    kept = {r["event_type"]: r["n"] for r in
            purged.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for t, r in rows.items():
        assert r["n_removed"] + r["n_kept"] == r["n_total"], t
        assert r["n_kept"] == kept.get(t, 0), t


def test_dau_wau_bounds_and_fan_out_equivalence(spark):
    """DAU <= WAU (a day's actives are inside its trailing week),
    stickiness in (0, 1], every observed day present, and WAU equals
    a literal trailing-7-day distinct count."""
    rows = {r["day"]: r for r in Q.events_dau_wau(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    du = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    observed = {r["day"] for r in du.select("day").distinct().collect()}
    assert set(rows) == observed
    pairs = [(r["day"], r["user_id"]) for r in du.collect()]
    from datetime import timedelta

    for day, r in rows.items():
        assert 0 < r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0
        lo = day - timedelta(days=6)
        want = len({u for d, u in pairs if lo <= d <= day})
        assert r["wau"] == want, day


def test_pareto_abc_partitions_and_thresholds(spark):
    """The three classes partition customers and revenue; shares obey
    the 80/95 construction (class A's cumulative share <= 0.8 and is
    maximal: adding B's first customer would cross it)."""
    rows = {r["abc"]: r for r in Q.orders_pareto_abc(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    r = (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice") * 100).cast("long").alias("cents"))
        .collect()
    )
    total = sum(x["cents"] for x in r)
    n_cust = len(r)
    assert sum(x["n_customers"] for x in rows.values()) == n_cust
    assert sum(x["cents"] for x in rows.values()) == total
    # replay the classification
    ranked = sorted(r, key=lambda x: (-x["cents"], x["o_custkey"]))
    cum, want = 0, {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
    for x in ranked:
        cum += x["cents"]
        cls = "A" if cum * 5 <= total * 4 else (
            "B" if cum * 20 <= total * 19 else "C")
        want[cls][0] += 1
        want[cls][1] += x["cents"]
    for cls, (n, cents) in want.items():
        if n == 0:
            assert cls not in rows
        else:
            assert rows[cls]["n_customers"] == n, cls
            assert rows[cls]["cents"] == cents, cls


def test_recall_evals_share_the_same_truth(spark):
    """Both generator evals must grade against the identical ground
    truth: n_truth equal across the two entries, and metrics obey the
    same consistency bounds."""
    lsh = Q.dedup_lsh_recall(spark, SF).head()
    sim = Q.dedup_simhash_recall(spark, SF).head()
    assert lsh["n_truth"] == sim["n_truth"]
    for r in (lsh, sim):
        assert r["n_hit"] <= min(r["n_truth"], r["n_cand"])
        assert 0.0 <= r["recall"] <= 1.0


def test_sq8_recall_bounds_and_dequant_grid(spark):
    """hits <= k per query; and the dequantized values land exactly on
    the 255-step per-dimension grid (code round-trips to an integer in
    [0, 255])."""
    rows = Q.embedding_sq8_recall(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hits"] <= r["k"] == 5

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    import numpy as np

    X = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    mn, mx = X.min(axis=0), X.max(axis=0)
    span = np.where(mx > mn, mx - mn, 1.0)
    dq = mn + np.round((X - mn) / span * 255.0) * span / 255.0
    codes = (dq - mn) / span * 255.0
    assert np.allclose(codes, np.round(codes), atol=1e-6)
    assert codes.min() >= -1e-9 and codes.max() <= 255 + 1e-9


def test_pit_join_never_leaks_the_future(spark):
    """The leakage guard itself: every matched state version must be
    AT OR BEFORE its purchase, and must be the LATEST such version —
    re-derived row-by-row from the raw events."""
    out = Q.events_pit_state_join(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    versions = {}
    for r in ev.where(F.col("event_type") == "signup").collect():
        versions.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    for vs in versions.values():
        vs.sort()
    n_null = 0
    for r in out:
        vs = [v for v in versions.get(r["user_id"], [])
              if v[0] <= r["purchase_ts"]]
        if not vs:
            assert r["state_value"] is None
            n_null += 1
        else:
            assert r["state_value"] == vs[-1][2], r
    assert n_null >= 0


def test_attribution_credits_are_correct_and_window_bounded(spark):
    """First/last credits re-derived row-by-row: both touches lie in
    [purchase-24h, purchase], first <= last in event time, and the
    keyed range join found EVERY in-window touch (n_touches exact)."""
    from datetime import timedelta

    out = Q.events_attribution(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    touches = {}
    for r in ev.where(F.col("event_type").isin("view", "click")).collect():
        touches.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    purch = {r["event_id"]: r for r in
             ev.where(F.col("event_type") == "purchase").collect()}
    assert out
    for r in out:
        p = purch[r["pid"]]
        lo = p["ts"] - timedelta(hours=24)
        win = sorted(t for t in touches.get(p["user_id"], [])
                     if lo <= t[0] <= p["ts"])
        assert len(win) == r["n_touches"], r["pid"]
        assert (win[0][1], win[0][2]) == (r["first_tid"], r["first_touch"])
        assert (win[-1][1], win[-1][2]) == (r["last_tid"], r["last_touch"])


def test_rfm_segments_partition_customers_and_scores_are_quartiles(spark):
    """Segments partition every ordering customer; each score digit is
    in 1..4; customer counts per R digit are balanced like ntile."""
    rows = Q.orders_rfm_segments(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    from collections import Counter

    r_digit = Counter()
    for r in rows:
        seg = r["rfm_segment"]
        assert len(seg) == 3 and all(ch in "1234" for ch in seg), seg
        r_digit[seg[0]] += r["n_customers"]
    # ntile(4) balance: bucket sizes differ by at most 1
    sizes = sorted(r_digit.values())
    assert len(sizes) == 4 and sizes[-1] - sizes[0] <= 1


def test_streaming_cusum_equals_batch(spark):
    """The lambda-topology monitor must equal the batch detector
    exactly when fed the same events — micro-batch boundaries cannot
    change an order-insensitive aggregate."""
    batch = sorted(map(tuple, Q.events_cusum_changepoint(spark, SF).collect()))
    stream = sorted(map(tuple, Q.streaming_cusum_monitor(spark, SF).collect()))
    assert batch == stream
