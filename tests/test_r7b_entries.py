"""Property tests for the round-7b additions (sketch quantiles,
dimension-truncation recall, sorted-neighborhood blocking, matched
sampling) — invariants the Spark==DuckDB oracle check can't express."""

import math

import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def test_sketch_quantile_error_bound(spark):
    """The sketch contract: every estimate lies within ONE bin width
    (2000.0 here) of the true rank-t value, because the covering bin
    contains both the t-th smallest value and the interpolated
    estimate."""
    out = {
        (r["o_orderpriority"], r["q_permille"]): r["est"]
        for r in Q.orders_sketch_quantiles(spark, SF).collect()
    }
    vals = {}
    for r in (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    ):
        vals.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    assert len(out) == 3 * len(vals)
    for grp, xs in vals.items():
        xs.sort()
        n = len(xs)
        for qm in (500, 900, 990):
            t = -(-qm * n // 1000)  # ceil(q*n), integer
            exact = xs[t - 1]
            est = out[(grp, qm)]
            assert abs(est - exact) <= 2000.0 + 1e-9, (grp, qm, est, exact)


def test_sketch_merge_is_addition(spark):
    """Mergeability: sketching a disjoint two-shard union (shards
    partitioned differently) equals sketching the original — the
    per-bin counts are the whole sketch state and they add."""
    from spark_tsne_spark.operators.quantiles import (
        histogram_sketch_quantiles,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    a = orders.where(F.col("o_orderkey") % 2 == 0).repartition(7)
    b = orders.where(F.col("o_orderkey") % 2 == 1).repartition(3)
    kw = dict(
        value_col="o_totalprice", group_col="o_orderpriority",
        qs_permille=[500, 900], lo=0.0, hi=500000.0, bins=250,
    )
    whole = sorted(map(tuple, histogram_sketch_quantiles(orders, **kw).collect()))
    merged = sorted(map(tuple, histogram_sketch_quantiles(a.unionAll(b), **kw).collect()))
    assert whole == merged


def test_sketch_validation():
    from spark_tsne_spark.operators.quantiles import (
        histogram_sketch_quantiles,
    )

    with pytest.raises(ValueError):
        histogram_sketch_quantiles(None, "v", "g", [0], 0.0, 1.0)
    with pytest.raises(ValueError):
        histogram_sketch_quantiles(None, "v", "g", [500], 1.0, 1.0)
    with pytest.raises(ValueError):
        histogram_sketch_quantiles(None, "v", "g", [500], 0.0, 1.0, bins=1)


def test_dim_truncation_recall_shape(spark):
    """2 dims x 10 queries, k pinned at 5, hits in [0, k]; on the
    fixed sf0.001 fixture more dimensions must not hurt mean recall
    (the Matryoshka premise the eval exists to measure)."""
    rows = Q.ann_dim_truncation_recall(spark, SF).collect()
    assert len(rows) == 20
    by_dim = {}
    for r in rows:
        assert r["k"] == 5
        assert 0 <= r["hits"] <= 5
        by_dim.setdefault(r["dim"], []).append(r["hits"])
    assert sorted(by_dim) == [8, 16]
    assert sum(by_dim[16]) >= sum(by_dim[8])


def test_sorted_neighborhood_boundary_independence(spark):
    """The correctness risk of two-stage ranking is partition-boundary
    dependence — prove the emitted pair set is IDENTICAL under 1, 2,
    and 16 range partitions (1 partition == the plain sorted window
    semantics)."""
    from spark_tsne_spark.operators.dedup import sorted_neighborhood_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    outs = [
        sorted(
            map(tuple, sorted_neighborhood_pairs(
                docs, window=4, max_hamming=3, rank_partitions=p
            ).collect())
        )
        for p in (1, 2, 16)
    ]
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 0


def test_sorted_neighborhood_budget_and_contract(spark):
    """Every pair respects the hamming cap, no pair is emitted twice,
    and the candidate budget is bounded by n x window regardless of
    signature skew."""
    from spark_tsne_spark.operators.dedup import (
        simhash,
        sorted_neighborhood_pairs,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    w = 8
    pairs = sorted_neighborhood_pairs(
        docs, window=w, max_hamming=3
    ).collect()
    keys = [(r["i"], r["j"]) for r in pairs]
    assert len(keys) == len(set(keys))
    assert len(keys) <= n * w
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in simhash(docs).collect()
    }
    for r in pairs:
        assert r["hamming"] <= 3
        assert bin(sigs[r["i"]] ^ sigs[r["j"]]).count("1") == r["hamming"]


def test_matched_sample_counts_and_determinism(spark):
    """Per bin the sample takes exactly min(want, candidates) rows,
    never a reference row, and the draw is invariant to input
    partitioning (content-hash ranked, not position-sampled)."""
    from spark_tsne_spark.operators.sampling import (
        distribution_matched_sample,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kw = dict(
        ref_cond=F.col("source") == "src0",
        bin_expr=F.expr("n_chars div 50"),
        key=F.col("text"),
        id_col="doc_id",
        salt="match1",
    )
    out = distribution_matched_sample(docs, **kw).collect()
    assert all(r["source"] != "src0" for r in out)
    want = {
        r["bin"]: r["n"]
        for r in docs.where(F.col("source") == "src0")
        .groupBy(F.expr("n_chars div 50").alias("bin"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    cand = {
        r["bin"]: r["n"]
        for r in docs.where(F.col("source") != "src0")
        .groupBy(F.expr("n_chars div 50").alias("bin"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {}
    for r in out:
        got[r["bin"]] = got.get(r["bin"], 0) + 1
    for b, wn in want.items():
        assert got.get(b, 0) == min(wn, cand.get(b, 0)), b
    re_out = distribution_matched_sample(docs.repartition(13), **kw).collect()
    assert sorted((r["bin"], r["doc_id"]) for r in out) == sorted(
        (r["bin"], r["doc_id"]) for r in re_out
    )


def test_containment_asymmetry(spark):
    """A doc whose shingles are a strict subset of a longer doc's has
    containment 1.0 in the short→long direction and < 1.0 back."""
    from spark_tsne_spark.operators.dedup import ngram_containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words here entirely"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["src_doc"], r["in_doc"]): r["containment"]
        for r in ngram_containment_pairs(
            docs, n=2, min_containment=0.0
        ).collect()
    }
    assert out[(1, 2)] == pytest.approx(1.0)
    assert out[(2, 1)] == pytest.approx(3 / 7)
    assert (1, 3) not in out and (3, 1) not in out


def test_js_divergence_bounds_and_identity(spark):
    """JS (log2) lives in [0, 1]; two sources with identical token
    streams diverge by exactly 0."""
    rows = Q.source_js_divergence(spark, SF).collect()
    assert len(rows) == 190  # C(20, 2)
    for r in rows:
        assert -1e-9 <= r["js"] <= 1.0 + 1e-9, r
    from pyspark.sql import functions as _F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    twin = docs.withColumn("source", _F.lit("a")).unionAll(
        docs.withColumn("source", _F.lit("b"))
    )
    import spark_tsne_spark.plans.queries as QQ

    # rebuild the entry's plan on the twin corpus
    from spark_tsne_spark.operators.search import vocab_top_terms
    from spark_tsne_spark.functions.text import tokens

    vocab = vocab_top_terms(twin, k=200).select("term")
    terms = twin.select("source", _F.explode(tokens("text")).alias("term"))
    cnt = terms.join(_F.broadcast(vocab), "term").groupBy(
        "source", "term"
    ).agg(_F.count("*").alias("c"))
    tot = cnt.groupBy("source").agg(_F.sum("c").alias("tot"))
    dense = tot.crossJoin(_F.broadcast(vocab)).join(
        cnt, ["source", "term"], "left"
    ).select(
        "source", "term",
        (_F.coalesce("c", _F.lit(0)) / _F.col("tot")).alias("p"),
    )
    a = dense.select(_F.col("source").alias("sa"), "term", _F.col("p").alias("pa"))
    b = dense.select(_F.col("source").alias("sb"), "term", _F.col("p").alias("pb"))
    m = (_F.col("pa") + _F.col("pb")) / 2
    contrib = _F.lit(0.5) * _F.when(
        _F.col("pa") > 0, _F.col("pa") * _F.log2(_F.col("pa") / m)
    ).otherwise(0.0) + _F.lit(0.5) * _F.when(
        _F.col("pb") > 0, _F.col("pb") * _F.log2(_F.col("pb") / m)
    ).otherwise(0.0)
    js = (
        a.join(b, "term").where(_F.col("sa") < _F.col("sb"))
        .agg(_F.round(_F.sum(_F.round(contrib * 1e9).cast("long")) / 1e9, 6))
        .collect()[0][0]
    )
    assert js == 0.0


def test_source_novelty_conservation(spark):
    """Novel shingles partition the global distinct-shingle set: the
    per-source novel counts sum to the number of distinct shingles in
    the corpus, and the lexicographically first source is 100%
    novel."""
    rows = Q.source_novelty(spark, SF).collect()
    assert len(rows) == 20
    from pyspark.sql import functions as _F
    from spark_tsne_spark.functions.text import word_ngrams

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_distinct = (
        docs.select(
            _F.explode_outer(
                _F.array_distinct(word_ngrams("text", 3))
            ).alias("g")
        )
        .where(_F.col("g").isNotNull())
        .select("g")
        .distinct()
        .count()
    )
    assert sum(r["novel_shingles"] for r in rows) == n_distinct
    first = min(r["source"] for r in rows)
    frow = next(r for r in rows if r["source"] == first)
    assert frow["novel_shingles"] == frow["total_shingles"]
    assert frow["novelty"] == 1.0
