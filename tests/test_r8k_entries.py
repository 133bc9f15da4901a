"""Property tests for the round-8k operators: Kneser-Ney bigram LM
and UMass topic coherence."""

import math
import os
import re
from collections import Counter, defaultdict

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_kneser_ney_matches_driver(spark):
    """Every reported p_kn must equal the textbook interpolated-KN
    closed form recomputed from driver-side bigram counts; the
    discounted mass must be redistributed (0 < p <= 1)."""
    from spark_tsne_spark.plans.queries import _t, catalog

    docs = _t(spark, SF, "documents").select("text").collect()
    bg = Counter()
    for d in docs:
        toks = [t for t in re.split(r"\s+", d["text"].strip()) if t]
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    c1 = Counter()
    followers = Counter()
    predecessors = Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        followers[a] += 1
        predecessors[b] += 1
    nbt = len(bg)
    rows = catalog()["bigram_kneser_ney"].fn(spark, SF).collect()
    assert len(rows) == min(30, nbt)
    for r in rows:
        a, b = r["w1"], r["w2"]
        assert r["c12"] == bg[(a, b)]
        want = (max(bg[(a, b)] - 0.75, 0) / c1[a]) + (
            0.75 * followers[a] / c1[a]
        ) * (predecessors[b] / nbt)
        assert abs(r["p_kn"] - want) < 2e-6
        assert 0.0 < r["p_kn"] <= 1.0


def test_kneser_ney_rows_sum_below_one_per_context(spark):
    """For any context w1, the sum of p_kn over its OBSERVED
    followers must be <= 1 (the remaining mass belongs to unseen
    continuations)."""
    from spark_tsne_spark.plans.queries import catalog

    rows = catalog()["bigram_kneser_ney"].fn(spark, SF).collect()
    by_ctx = defaultdict(float)
    for r in rows:
        by_ctx[r["w1"]] += r["p_kn"]
    for w1, s in by_ctx.items():
        assert s <= 1.0 + 1e-6, w1


def test_topic_coherence_matches_driver(spark):
    """Pair doc-frequencies and UMass scores must equal a driver
    recomputation over the distinct (doc, term) sets."""
    from spark_tsne_spark.plans.queries import _t, catalog

    docs = _t(spark, SF, "documents").select("doc_id", "text").collect()
    docsets = defaultdict(set)
    for d in docs:
        for t in re.split(r"\s+", d["text"].strip()):
            if t:
                docsets[t].add(d["doc_id"])
    top = sorted(docsets.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:6]
    rows = catalog()["docs_topic_coherence"].fn(spark, SF).collect()
    assert len(rows) == 15
    got = {(r["w_i"], r["w_j"]): r for r in rows}
    total = 0.0
    for i in range(6):
        for j in range(i + 1, 6):
            wi, si = top[i]
            wj, sj = top[j]
            r = got[(wi, wj)]
            dij = len(si & sj)
            assert (r["d_i"], r["d_j"], r["d_ij"]) == (len(si), len(sj), dij)
            score = round(math.log((dij + 1) / len(si)), 6)
            assert r["pair_score"] == score
            total += score
    assert rows[0]["umass_coherence"] == round(total, 6)
