"""Sequence packing + token-budget mixing (operators/packing.py)."""

import pytest
from pyspark.sql import Window, functions as F

from spark_tsne_spark.functions.text import bpe_ish_token_count
from spark_tsne_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
    token_budget_sample,
)
from spark_tsne_spark.operators.sampling import hash_bucket

BLOCK = 128


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    df.count()
    return df


def test_prefix_sum_matches_local_cumsum(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r["k"]: r["offset"]
        for r in exclusive_prefix_sum(df, "k", "v", num_partitions=7).collect()
    }
    acc = 0
    for k, v in rows:  # already in k order
        assert out[k] == acc, k
        acc += v


def test_prefix_sum_partition_invariant(spark):
    rows = [(i, i % 5 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    a = exclusive_prefix_sum(df, "k", "v", num_partitions=3).collect()
    b = exclusive_prefix_sum(
        df.repartition(13), "k", "v", num_partitions=8
    ).collect()
    assert sorted((r["k"], r["offset"]) for r in a) == sorted(
        (r["k"], r["offset"]) for r in b
    )


def test_pack_covers_every_token_exactly_once(spark, docs):
    packed = pack_sequences(docs, block_size=BLOCK).cache()
    n_tok = docs.select(
        F.col("doc_id"), bpe_ish_token_count("text").cast("long").alias("n")
    ).where(F.col("n") > 0)

    # per-document: the spans add back up to the doc's token count
    per_doc = packed.groupBy("doc_id").agg(
        F.sum("seg_len").alias("s"), F.first("n_tok").alias("n_tok")
    )
    assert per_doc.where(F.col("s") != F.col("n_tok")).count() == 0
    assert per_doc.count() == n_tok.count()

    # per-block: exactly BLOCK tokens except the final block
    per_block = packed.groupBy("block").agg(F.sum("seg_len").alias("s"))
    last = per_block.agg(F.max("block")).collect()[0][0]
    assert per_block.where(
        (F.col("block") != last) & (F.col("s") != BLOCK)
    ).count() == 0
    total = n_tok.agg(F.sum("n")).collect()[0][0]
    assert packed.agg(F.sum("seg_len")).collect()[0][0] == total

    # spans stay inside their block
    bad = packed.where(
        (F.col("block_off") < 0)
        | (F.col("block_off") >= BLOCK)
        | (F.col("seg_len") <= 0)
        | (F.col("block_off") + F.col("seg_len") > BLOCK)
    )
    assert bad.count() == 0
    packed.unpersist()


def test_pack_block_size_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, block_size=0)


def test_token_budget_matches_naive_window(spark, docs):
    budgets = {"src0": 150, "src1": 90, "src2": 40}
    got = token_budget_sample(docs, budgets, salt="t1").collect()

    # naive semantics: per-source cumsum over hash order, inclusive <= budget
    h = hash_bucket("text", "t1")
    d = docs.select(
        "doc_id",
        F.col("source").alias("stratum"),
        bpe_ish_token_count("text").cast("long").alias("n_tok"),
        h.alias("h"),
    ).where(F.col("stratum").isin(*budgets))
    w = Window.partitionBy("stratum").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    naive = (
        d.withColumn("cum", F.sum("n_tok").over(w))
        .where(
            F.col("cum")
            <= F.when(F.col("stratum") == "src0", 150)
            .when(F.col("stratum") == "src1", 90)
            .otherwise(40)
        )
        .select("doc_id", "stratum", "n_tok", "cum")
        .collect()
    )
    key = lambda r: (r["stratum"], r["doc_id"], r["n_tok"], r["cum"])
    assert sorted(map(key, got)) == sorted(map(key, naive))


def test_token_budget_is_maximal_and_within_budget(spark, docs):
    budgets = {"src3": 200}
    kept = token_budget_sample(docs, budgets, salt="t2").collect()
    total = sum(r["n_tok"] for r in kept)
    assert total <= 200
    assert all(r["cum"] <= 200 for r in kept)

    # maximality: the first unkept doc in hash order would blow the budget
    h = hash_bucket("text", "t2")
    all_rows = (
        docs.where(F.col("source") == "src3")
        .select(
            "doc_id",
            bpe_ish_token_count("text").cast("long").alias("n_tok"),
            h.alias("h"),
        )
        .orderBy("h", "doc_id")
        .collect()
    )
    kept_ids = {r["doc_id"] for r in kept}
    for r in all_rows:
        if r["doc_id"] not in kept_ids:
            assert total + r["n_tok"] > 200
            break


def test_token_budget_partition_invariant(spark, docs):
    budgets = {"src4": 120, "src5": 300}
    a = token_budget_sample(docs, budgets, salt="t3").collect()
    b = token_budget_sample(docs.repartition(17), budgets, salt="t3").collect()
    key = lambda r: (r["stratum"], r["doc_id"], r["cum"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_token_budget_rejects_negative(spark, docs):
    with pytest.raises(ValueError):
        token_budget_sample(docs, {"src0": -1})


def test_tfidf_and_vocab_basic(spark):
    from spark_tsne_spark.operators.search import tfidf_top_terms, vocab_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry"),
            (3, "apple durian"),
        ],
        "doc_id long, text string",
    )
    top = tfidf_top_terms(df, top=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 in 2/3 docs beats cherry tf=1 in 2/3 docs;
    # banana (tf=1, df=2) ties cherry (tf=1, df=2) -> term asc
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert d1[0]["term"] == "apple" and d1[0]["tf"] == 2
    assert d1[1]["term"] == "banana"
    # doc 3: durian df=1 has the highest idf
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert d3[0]["term"] == "durian"

    vocab = vocab_top_terms(df, k=2).collect()
    assert [r["term"] for r in sorted(vocab, key=lambda r: r["rank"])] == [
        "apple",
        "cherry",
    ]  # both df=2; apple tf=3 > cherry tf=3? no: cherry tf=3 too -> term asc
