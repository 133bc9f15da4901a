"""Property tests for the round-7 catalog additions — invariants the
oracle equality check can't express (it proves Spark == DuckDB; these
prove both == the math)."""

import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def test_cms_never_undercounts(spark):
    """The count-min guarantee: est >= exact for EVERY word (collisions
    only inflate), and est == exact whenever no other word shares all
    d buckets."""
    out = Q.cms_heavy_hitters(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r["est"] >= r["exact"], r
        assert r["overcount"] == r["est"] - r["exact"]


def test_rrf_bounds_and_agreement(spark):
    """RRF scores live in (0, 2/61]; a doc ranked #1 by BOTH systems
    must fuse to the global #1."""
    rows = Q.rrf_hybrid_search(spark, SF).orderBy("rank").collect()
    assert 1 <= len(rows) <= 10
    for r in rows:
        assert 0 < r["rrf"] <= round(2 / 61, 6) + 1e-9, r
    both_first = [
        r for r in rows if r["bm25_rank"] == 1 and r["ql_rank"] == 1
    ]
    if both_first:
        assert both_first[0]["rank"] == 1


def test_zorder_spread_is_injective_and_buckets_partition(spark):
    """The magic-bits spread must be a bijection on 16-bit ints
    (otherwise distinct coordinates collide in z space), and the
    bucket census must cover every event exactly once."""
    from spark_tsne_spark.plans.queries import _z_spread_col

    n = 1 << 16
    d = spark.range(n).select(
        F.col("id").alias("x"), _z_spread_col(F.col("id")).alias("s")
    )
    assert d.select("s").distinct().count() == n
    ev_n = (
        spark.read.parquet(f"{SF}/events.parquet").count()
    )
    buckets = Q.zorder_layout_stats(spark, SF).agg(F.sum("n")).collect()[0][0]
    assert buckets == ev_n


def test_recall_hits_bounded(spark):
    out = Q.ann_recall_at_k(spark, SF).collect()
    assert len(out) == 10
    for r in out:
        assert 0 <= r["hits"] <= r["k"] == 5, r


def test_schema_evolution_matches_explicit_schema_read(spark):
    """mergeSchema must equal an explicit-schema read of the same
    files — evolution is metadata, never data rewriting."""
    out1 = Q.schema_evolution_read(spark, SF)
    rows1 = {r["source"]: r for r in out1.collect()}
    path = Q._schema_evo_path(SF)
    explicit = (
        spark.read.schema(
            "doc_id long, source string, n_chars long, quality long"
        )
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    rows2 = {
        r["source"]: r
        for r in explicit.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce(F.col("quality"), F.lit(0))).alias("sum_quality"),
        )
        .collect()
    }
    assert rows1.keys() == rows2.keys()
    for s in rows1:
        assert rows1[s]["n"] == rows2[s]["n"]
        assert rows1[s]["sum_quality"] == rows2[s]["sum_quality"]


def test_benford_census_is_complete(spark):
    rows = Q.dq_benford_digits(spark, SF).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set("123456789")
    n_orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .where(F.col("o_totalprice") > 0)
        .count()
    )
    assert sum(r["n"] for r in rows) == n_orders
    # Benford fractions sum to 1 over all nine digits by identity.
    import math

    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1) < 1e-12


def test_trigram_lm_scores_are_proper_nlls(spark):
    """Every held-out doc gets a finite positive avg negative
    log-likelihood (P is a proper sub-1 probability thanks to the
    add-one unigram floor), and only the 20% eval split is scored."""
    out = Q.trigram_lm_ppl(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r["doc_id"] % 10 >= 8
        assert r["n_scored"] > 0
        assert 0 < r["avg_nll"] < 100, r
